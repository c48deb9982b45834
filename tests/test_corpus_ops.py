"""Behavioral tests for the corpus-preparation operators (PII redaction,
chunking, splitting, decontamination, packing, profiling) — properties the
oracle equivalence can't express: coverage invariants, determinism under
repartitioning, and known-answer fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.corpus import (
    assign_split,
    chunk_documents,
    decontaminate,
    pack_token_budget,
    profile_columns,
    redact_pii,
)

PII_DOCS = [
    (1, "mail alice@example.com and bob.smith+x@mail.co.uk please"),
    (2, "call +1 555 123 4567 now"),
    (3, "ping 10.0.0.1 then 192.168.255.254"),
    (4, "nothing sensitive here"),
    (5, ""),
]


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(PII_DOCS, ["doc_id", "text"])


def test_redact_pii_counts_and_text(pii_docs):
    r = redact_pii(F.col("text"))
    rows = {
        row["doc_id"]: row
        for row in pii_docs.select(
            "doc_id",
            r["redacted"].alias("red"),
            r["n_emails"].alias("ne"),
            r["n_ips"].alias("ni"),
            r["n_phones"].alias("np"),
        ).collect()
    }
    assert rows[1]["ne"] == 2 and "[EMAIL]" in rows[1]["red"]
    assert "@" not in rows[1]["red"]
    assert rows[2]["np"] == 1 and rows[2]["red"] == "call [PHONE] now"
    assert rows[3]["ni"] == 2 and rows[3]["red"] == "ping [IP] then [IP]"
    # IPs must NOT be eaten by the phone pattern (dots break the digit run)
    assert rows[3]["np"] == 0
    assert rows[4]["red"] == "nothing sensitive here"
    assert rows[5]["red"] == ""


def test_chunking_covers_text_with_overlap(spark):
    text = "x" * 500
    docs = spark.createDataFrame([(1, text), (2, "short"), (3, "")], ["doc_id", "text"])
    chunks = chunk_documents(docs, size=120, stride=90).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    # 500 chars, size 120, stride 90 -> 1 + ceil(380/90) = 6 chunks
    ours = sorted(by_doc[1], key=lambda c: c["chunk_idx"])
    assert len(ours) == 6
    # full coverage: consecutive starts differ by stride < size (overlap),
    # and the last chunk reaches the end of the text
    starts = [c["chunk_start"] for c in ours]
    assert starts == [1 + 90 * i for i in range(6)]
    last = ours[-1]
    assert last["chunk_start"] + last["n_chunk_chars"] - 1 == 500
    # degenerate docs still produce exactly one chunk (nothing disappears)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_chars"] == 5
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_chars"] == 0


def test_split_deterministic_and_proportional(spark):
    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = assign_split(F.col("doc_id"))
    out = ids.select("doc_id", a["split"].alias("split"))
    frac = {
        r["split"]: r["n"] / 2000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["train"] - 0.80) < 0.03
    assert abs(frac["valid"] - 0.10) < 0.02
    assert abs(frac["test"] - 0.10) < 0.02
    # pure function of the key: identical assignment on any partitioning
    again = (
        ids.repartition(7)
        .select("doc_id", assign_split(F.col("doc_id"))["split"].alias("split"))
    )
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_decontaminate_flags_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely disjoint vocabulary nothing shared here at all"),
            (3, "quick brown fox appears again in this other document"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["eval_id", "text"]
    )
    hits = {r["doc_id"]: r for r in decontaminate(train, ev).collect()}
    # doc 1 shares 3 shingles ("the quick brown", "quick brown fox",
    # "brown fox jumps"), doc 3 shares 1, doc 2 none
    assert hits[1]["n_shared_ngrams"] == 3 and hits[1]["n_eval_docs"] == 1
    assert hits[3]["n_shared_ngrams"] == 1
    assert 2 not in hits


def test_pack_token_budget_first_fit(spark):
    # 5 docs of 10 tokens each, budget 25 -> bins of 3 docs (0,10,20) + 2
    docs = spark.createDataFrame(
        [(i, "g", "w " * 10) for i in range(5)], ["doc_id", "source", "text"]
    )
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_token_budget(docs, budget=25).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_profile_columns_known_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (3, "b")], ["k", "v"]
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 3
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "3"
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["n_distinct"] == 2
    assert prof["v"]["min_value"] == "a" and prof["v"]["max_value"] == "b"


def test_stratified_sample_deterministic_rates(spark):
    from wiki_mysql_spark.operators.corpus import stratified_sample

    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "k")
        .withColumn("g", F.when(F.col("k") % 2 == 0, "a").otherwise("b"))
    )
    out = stratified_sample(
        df, key=F.col("k"), stratum_col="g", rates={"a": 0.25, "b": 0.75}
    )
    frac = {
        r["g"]: r["n"] / 2000
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["a"] - 0.25) < 0.05 and abs(frac["b"] - 0.75) < 0.05
    # re-running on a different partitioning selects the identical rows
    again = stratified_sample(
        df.repartition(13), key=F.col("k"), stratum_col="g", rates={"a": 0.25, "b": 0.75}
    )
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_merge_upsert_actions(spark):
    from wiki_mysql_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([(1, 10, 5.0), (2, 20, 7.0)], ["k", "n", "v"])
    source = spark.createDataFrame([(2, 3, 1.0), (9, 4, 2.0)], ["k", "n", "v"])
    out = {
        r["k"]: r
        for r in merge_upsert(
            target, source, on="k", strategies={"n": "sum", "v": "max"}
        ).collect()
    }
    assert out[1]["action"] == "keep" and out[1]["n"] == 10 and out[1]["v"] == 5.0
    assert out[2]["action"] == "update" and out[2]["n"] == 23 and out[2]["v"] == 7.0
    assert out[9]["action"] == "insert" and out[9]["n"] == 4 and out[9]["v"] == 2.0


def test_scd2_history_intervals(spark):
    from wiki_mysql_spark.operators.cdc import scd2_history

    rows = [
        (1, "a", 1, 101),
        (1, "a", 2, 102),  # same run
        (1, "b", 3, 103),  # change
        (1, "a", 4, 104),  # change back -> new run, not merged with the first
        (2, "x", 1, 201),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "eid"])
    hist = sorted(
        scd2_history(df, key="k", attr="attr", ts_col="ts", tiebreak="eid").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    u1 = [r for r in hist if r["k"] == 1]
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("a", 1, 3),
        ("b", 3, 4),
        ("a", 4, None),
    ]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in hist if r["k"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_bloom_no_false_negatives_and_native_probe(spark):
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.bloom import build_bloom, might_contain

    members = spark.createDataFrame(
        [(f"member {i}",) for i in range(500)], ["s"]
    )
    bloom = build_bloom(members, "s", n_bits=1 << 14, n_hashes=5)
    assert len(bloom) == (1 << 14) // 64 and any(bloom)
    # no false negatives: every member passes the probe
    n_pass = members.where(might_contain(F.col("s"), bloom, n_bits=1 << 14,
                                         n_hashes=5)).count()
    assert n_pass == 500
    # false positives bounded: 500 members in 16 Kbits, k=5 -> fp ~ 0.1%;
    # allow 2% slack on 2000 non-members
    non = spark.createDataFrame([(f"stranger {i}",) for i in range(2000)], ["s"])
    probe = non.where(might_contain(F.col("s"), bloom, n_bits=1 << 14, n_hashes=5))
    assert probe.count() <= 40
    # the probe is pure JVM expression work — no Python eval in the plan
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_bloom_equals_exact_join(spark):
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.bloom import decontaminate_bloom
    from wiki_mysql_spark.operators.corpus import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words in this training document here"),
            (3, "quick brown fox appears again in this one too"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox")], ["eval_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in decontaminate_bloom(train, ev, n=3).collect()
    }
    want = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in decontaminate(train, ev).collect()
    }
    assert got == want and set(got) == {1, 3}


def test_url_canonicalization_rules_fire(spark):
    """Port stripping, case folding, fragment dropping, and utm removal must
    all fire, and the messy/clean twins must land in one dedup group."""
    from wiki_mysql_spark.queries import QUERIES
    from tests.conftest import SF_CORRECTNESS

    rows = {
        r["canonical"]: (r["n_urls"], r["keep_url_id"])
        for r in QUERIES["text_url_normalize_dedup"](spark, SF_CORRECTNESS).collect()
    }
    # 500001 (messy: port 80, case, utm, fragment) == 500005 (utm at tail)
    assert rows["http://example.com/Path/Page?id=2&b=1"] == (2, 500001)
    # 500003 (port 443 + utm-only query) == 500004 (clean)
    assert rows["https://example.com/other"] == (2, 500003)
    # subdomain stays distinct
    assert rows["https://sub.example.com/other"] == (1, 500006)
    # param ORDER is preserved (sorting out of scope): b=1&id=2 is separate
    assert rows["http://example.com/Path/Page?b=1&id=2"] == (1, 500002)


def test_pack_context_windows_spans_and_conservation(spark):
    """Every token lands in exactly one window; docs split across a window
    boundary emit multiple spans whose lengths sum to the doc's count; each
    window holds exactly 256 tokens except a source's last."""
    from collections import defaultdict

    from wiki_mysql_spark.queries import QUERIES
    from tests.conftest import SF_CORRECTNESS

    rows = QUERIES["pack_context_windows"](spark, SF_CORRECTNESS).collect()
    per_doc = defaultdict(int)
    per_window = defaultdict(int)
    for r in rows:
        assert r["n_toks_in_window"] > 0
        per_doc[r["doc_id"]] += r["n_toks_in_window"]
        per_window[(r["source"], r["window_id"])] += r["n_toks_in_window"]
    # token conservation per source: full windows are exactly 256
    last_per_source = {}
    for (src, wid) in per_window:
        last_per_source[src] = max(last_per_source.get(src, -1), wid)
    for (src, wid), tot in per_window.items():
        if wid < last_per_source[src]:
            assert tot == 256, (src, wid, tot)
        else:
            assert 0 < tot <= 256
    # at least one document was split across windows (multi-span)
    spans = defaultdict(int)
    for r in rows:
        spans[r["doc_id"]] += 1
    assert any(v > 1 for v in spans.values())


def test_bpe_train_matches_hand_computation(spark):
    """BPE merges on a tiny corpus with hand-checkable counts: 'low' x5,
    'lower' x2, 'newest' x6, 'widest' x3. Classic worked example: 'es'
    (from -est words, 9) merges first under (count DESC, left, right)
    tie-break, then 'est' (9), then 'lo' (7)..."""
    from wiki_mysql_spark.operators.bpe import bpe_apply, bpe_train

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=3).orderBy("round").collect()
    ]
    assert got == [(1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7)], got
    # greedy non-overlap: 'aaaa' with merge (a,a) -> 'aa' 'aa' = 2 tokens
    docs2 = spark.createDataFrame([(1, "aaaa aaa")], ["doc_id", "text"])
    merges = [
        (r["left"], r["right"]) for r in bpe_train(docs2, n_merges=1).collect()
    ]
    assert merges == [("a", "a")]
    toks = {r["doc_id"]: r["n_tokens"] for r in bpe_apply(docs2, merges).collect()}
    assert toks == {1: 2 + 2}  # 'aaaa' -> aa,aa ; 'aaa' -> aa,a


def _bpe_reference(docs: list[str], n_merges: int):
    """Independent pure-Python BPE (frequency table + pair counts + greedy
    left-to-right merge), used only as a differential oracle here."""
    import collections
    import re

    freq = collections.Counter()
    for d in docs:
        for w in re.split(r"\s+", d.lower()):
            if w and re.fullmatch(r"[a-z]+", w):
                freq[w] += 1
    words = {tuple(w): c for w, c in freq.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        pc = collections.Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, cnt))
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


@pytest.mark.slowtier
def test_bpe_train_fuzz_vs_python_reference(spark):
    """Randomized differential test: 20 seeded random corpora (Zipf-ish
    words over a tiny alphabet to force merge-cascades and ties) — the
    distributed trainer must reproduce the independent pure-Python BPE
    exactly, including the (count DESC, left, right) tie-break."""
    import random

    from wiki_mysql_spark.operators.bpe import bpe_train

    rng = random.Random(0xB9E)
    for trial in range(20):
        vocab = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        ]
        docs = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(rng.randint(1, 8))
        ]
        want = _bpe_reference(docs, 4)
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
        )
        got = [
            (r["round"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(df, n_merges=4).orderBy("round").collect()
        ]
        assert got == want, f"trial {trial}: {got} != {want}\ndocs={docs}"


def test_dsir_weights_direction(spark):
    """DSIR sanity on a constructed corpus: docs made of target-exclusive
    words must get positive log-weights (selected), docs of
    source-exclusive words negative; weight grows with word count."""
    from wiki_mysql_spark.queries.llm_data import corpus_dsir_weights

    # build a parquet fixture shaped like documents
    import tempfile, os
    rows = []
    for i in range(10):
        rows.append((i, "aaa bbb aaa bbb aaa", "en", "src0", 19))       # target
    for i in range(10, 40):
        rows.append((i, "zzz yyy zzz yyy zzz", "en", "src5", 19))       # source-only
    # target-like words under a non-target source: few enough occurrences
    # that they don't flip the corpus-wide ratio of their own bucket
    rows.append((100, "aaa aaa aaa aaa", "en", "src7", 15))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    tmp = tempfile.mkdtemp(prefix="dsir_fix_")
    for name in ["documents"]:
        df.write.mode("overwrite").parquet(os.path.join(tmp, f"{name}.parquet"))
    out = {r["doc_id"]: r for r in corpus_dsir_weights(spark, tmp).collect()}
    assert out[0]["selected"] and out[0]["log_weight"] > 0
    assert not out[20]["selected"] and out[20]["log_weight"] < 0
    # target-like content is selected regardless of its source label
    assert out[100]["selected"] and out[100]["log_weight"] > 0
    assert out[100]["n_words"] == 4 and out[0]["n_words"] == 5
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slowtier
def test_dsir_fuzz_vs_python_reference(spark):
    """Differential fuzz for DSIR: 8 seeded random corpora through the
    Spark pipeline vs an independent pure-Python implementation of the
    same spec (md5-prefix buckets, add-one smoothing, BIGINT-scaled log
    ratios) — weights, word counts, and selection flags must match
    exactly."""
    import hashlib
    import math
    import random
    import re
    import os
    import shutil
    import tempfile

    from wiki_mysql_spark.queries.llm_data import corpus_dsir_weights

    rng = random.Random(0xD51A)
    vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 5)))
             for _ in range(30)]
    for trial in range(8):
        rows = []
        for i in range(rng.randint(5, 25)):
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
            src = rng.choice(["src0", "src1", "src2", "src3"])
            rows.append((i, text, "en", src, len(text)))
        df = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        tmp = tempfile.mkdtemp(prefix="dsir_fuzz_")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r["doc_id"]: (r["n_words"], r["log_weight"], r["selected"])
            for r in corpus_dsir_weights(spark, tmp).collect()
        }
        shutil.rmtree(tmp, ignore_errors=True)

        # independent reference
        def bucket(w):
            return hashlib.md5(w.encode()).hexdigest()[:2]

        nt, ns = {}, {}
        per_doc = {}
        for doc_id, text, _, src, _ in rows:
            ws = [w for w in re.split(r"\s+", text.lower())
                  if w and re.fullmatch(r"[a-z]+", w)]
            bs = [bucket(w) for w in ws]
            per_doc[doc_id] = bs
            for b in bs:
                ns[b] = ns.get(b, 0) + 1
                if src in ("src0", "src1"):
                    nt[b] = nt.get(b, 0) + 1
        T, S = sum(nt.values()), sum(ns.values())
        lr = {
            b: round(math.log((nt.get(b, 0) + 1) * (S + 256)
                              / ((ns[b] + 1) * (T + 256))) * 1_000_000)
            for b in ns
        }
        want = {}
        for doc_id, bs in per_doc.items():
            if not bs:
                continue
            tot = sum(lr[b] for b in bs)
            want[doc_id] = (len(bs), tot / 1_000_000.0, tot > 0)
        assert got == want, f"trial {trial}"
