"""Property-based differential tests (hypothesis): the Spark operators must
agree with direct pure-Python models on randomized inputs — cleaning-chain
regexes against Python re, redirect fixpoint against a dict-walk exactly
shaped like the reference's ``resolve`` (``/root/reference/dbfy.py:108-121``).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.cleaning import collapse_whitespace, extract_redirect_target
from wiki_mysql_spark.operators.redirects import resolve_redirects

SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

texts = st.lists(
    st.text(alphabet=" \t\nabcXYZ#[]{}|<>&;", min_size=0, max_size=60),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(texts)
def test_collapse_whitespace_matches_python_re(spark, batch):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], ["i", "t"])
    got = {
        r["i"]: r["o"]
        for r in df.select("i", collapse_whitespace(F.col("t")).alias("o")).collect()
    }
    for i, t in enumerate(batch):
        assert got[i] == re.sub(r"(\s)\s*", r"\g<1>", t)


@SETTINGS
@given(texts)
def test_redirect_extract_matches_python_re(spark, batch):
    pat = re.compile(r"\#REDIRECT \[\[([^\]]*)\]\]")
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], ["i", "t"])
    got = {
        r["i"]: r["o"]
        for r in df.select("i", extract_redirect_target(F.col("t")).alias("o")).collect()
    }
    for i, t in enumerate(batch):
        m = pat.match(t)
        want = m.group(1) if m and m.group(1) != "" else None
        assert got[i] == want, (t, got[i], want)


graphs = st.builds(
    lambda edges, targets: (edges, targets),
    st.dictionaries(
        st.integers(0, 15).map(lambda i: f"T{i}"),
        st.integers(0, 19).map(lambda i: f"T{i}"),
        max_size=12,
    ),
    st.sets(st.integers(16, 19).map(lambda i: f"T{i}"), max_size=4),
)


def _reference_resolve(title, redirects, targets, depth=0):
    """The reference's resolve(), iteratively (dbfy.py:108-121): follow the
    chain; loaded title -> its body id; cycle/dangling -> None."""
    seen = set()
    cur = title
    while True:
        if cur in targets:
            return cur
        if cur in redirects and cur not in seen:
            seen.add(cur)
            cur = redirects[cur]
            continue
        return None


@SETTINGS
@given(graphs)
def test_fixpoint_matches_reference_model(spark, graph):
    edges, target_titles = graph
    edges = {s: d for s, d in edges.items() if s not in target_titles}
    if not edges:
        return
    redirects = spark.createDataFrame(
        [(s, d, i) for i, (s, d) in enumerate(sorted(edges.items()))],
        ["title", "target", "aid"],
    )
    targets = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(sorted(target_titles))] or [("_none_", 0)],
        ["title", "body_id"],
    )
    body_of = {t: i + 1 for i, t in enumerate(sorted(target_titles))}
    got = {
        r["title"]: r["body_id"]
        for r in resolve_redirects(redirects, targets, max_depth=64).collect()
    }
    want = {}
    for s in edges:
        end = _reference_resolve(edges[s], edges, target_titles)
        if end is not None:
            want[s] = body_of[end]
    assert got == want


# --------------------------------------------------------------------------
# as-of join vs a pure-Python model
# --------------------------------------------------------------------------

_asof_inputs = st.tuples(
    # left: (key, t) event probes
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=25,
    ),
    # right: (key, t, val) quotes
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
)


@SETTINGS
@given(_asof_inputs)
def test_asof_join_matches_python_model(spark, inp):
    """asof_join == 'latest right row with rt <= lt per key' for arbitrary
    inputs, including duplicate timestamps (tie on rt: largest val wins via
    the operator's documented value tie-break ordering)."""
    import datetime

    from wiki_mysql_spark.operators.asof import asof_join

    left_rows, right_rows = inp
    epoch = datetime.datetime(2024, 1, 1)

    def ts(sec):
        return epoch + datetime.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left_rows)],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(k, ts(t), v) for (k, t, v) in right_rows], ["k", "ts", "v"]
    ) if right_rows else spark.createDataFrame(
        [], "k long, ts timestamp, v long"
    )

    got = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="ts", right_time="ts",
            right_values=["v"],
        ).collect()
    }

    for i, (k, t) in enumerate(left_rows):
        candidates = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= t]
        want = max(candidates)[1] if candidates else None
        assert got[i] == want, (i, k, t, candidates, got[i])


asof_series = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)),  # (key, time)
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(asof_series, asof_series, st.sampled_from(["backward", "forward", "nearest"]))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows, direction):
    """All three as-of directions must agree with pandas merge_asof — the
    canonical reference semantics (including tie handling)."""
    import pandas as pd

    from wiki_mysql_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], ["k", "t", "lid"]
    )
    # dedupe right on (k, t): merge_asof picks the LAST equal-time row while
    # a window fill picks one arbitrarily — identical values sidestep that
    runiq = {(k, t): (k, t, k * 1000 + t) for k, t in rrows}
    right = spark.createDataFrame(list(runiq.values()), ["k", "t", "v"])

    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_values=["v"], direction=direction,
        ).collect()
    }

    lpd = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lrows)],
                       columns=["k", "t", "lid"]).sort_values("t")
    rpd = pd.DataFrame(list(runiq.values()), columns=["k", "t", "v"]).sort_values("t")
    want_df = pd.merge_asof(lpd, rpd, on="t", by="k", direction=direction)
    want = {
        int(r.lid): (None if pd.isna(r.v) else int(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


_ntile_cases = st.tuples(
    st.integers(min_value=0, max_value=400),   # rows
    st.integers(min_value=1, max_value=12),    # tiles
    st.integers(min_value=1, max_value=8),     # key modulus -> duplicates
)


@SETTINGS
@given(_ntile_cases)
def test_global_ntile_property(spark, case):
    """For any (n rows, k tiles, duplicate-heavy keys): the distributed
    ntile must produce exactly the ANSI tile SIZES (first n%k tiles hold
    one extra row) and be monotone along the total order — the same
    invariants a single-task ntile guarantees."""
    from collections import Counter

    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.ids import global_ntile

    n, k, mod = case
    df = spark.range(n).select(
        (F.col("id") % mod).alias("key"), F.col("id").alias("uid")
    )
    rows = global_ntile(df, ["key", "uid"], k, tile_col="t").collect()
    assert len(rows) == n
    sizes = Counter(r["t"] for r in rows)
    q, r = divmod(n, k)
    expect = {i: q + (1 if i <= r else 0) for i in range(1, k + 1) if q or i <= r}
    assert dict(sizes) == {t: c for t, c in expect.items() if c}, (n, k, sizes)
    ordered = sorted(rows, key=lambda x: (x["key"], x["uid"]))
    tiles = [x["t"] for x in ordered]
    assert tiles == sorted(tiles), "tile assignment must be monotone in the order"


_range_frame_prices = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=5000),     # arbitrary
        st.sampled_from([0, 1000, 2000, 2999, 3000]),  # exact bucket edges
    ),
    min_size=1,
    max_size=120,
)


@SETTINGS
@given(_range_frame_prices)
def test_bucket_carry_range_frame_matches_global_window(spark, prices):
    """The distributed bucket-and-carry RANGE-frame spelling must equal the
    naive global-window count for every generated price multiset —
    including values exactly on bucket boundaries, duplicates, and ties
    (the cases where the carry-copy bookkeeping could double- or
    under-count)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    width = 1000
    rows = [(i, float(p)) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, ["k", "price"]).repartition(4)

    # naive truth: unpartitioned window (fine at test scale)
    w_naive = Window.orderBy("price").rangeBetween(-width, Window.currentRow)
    want = {
        r["k"]: r["n"]
        for r in df.select(
            "k", F.count(F.lit(1)).over(w_naive).alias("n")
        ).collect()
    }

    # distributed spelling: the window_range_frame bucket-and-carry shape
    b = F.floor(F.col("price") / width).cast("long")
    anchors = df.withColumn("_b", b).withColumn("_a", F.lit(True))
    carries = df.withColumn("_b", b + 1).withColumn("_a", F.lit(False))
    w = (
        Window.partitionBy("_b")
        .orderBy("price")
        .rangeBetween(-width, Window.currentRow)
    )
    got = {
        r["k"]: r["n"]
        for r in anchors.unionByName(carries)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("_a"))
        .select("k", "n")
        .collect()
    }
    assert got == want
