"""Training-data pipeline operators as oracle-checked queries: PII
redaction, overlapping chunking, deterministic train/valid/test splitting,
benchmark decontamination, token-budget sequence packing, and column
profiling (north-star extensions; closest reference hook is the cleaning
chain at ``/root/reference/filters.py:52-64`` which these run after).

The synthetic corpus contains no PII, so a small fixture with known
emails/IPs/phone numbers is unioned in (doc_id >= 200001) — otherwise the
redaction op would be vacuously the identity and the gate couldn't tell a
working operator from a broken one. The decontamination "benchmark set" is
derived from the corpus itself (200-char prefixes of every 97th doc) so
overlap is guaranteed non-vacuous at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.corpus import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    SPLIT_BOUNDS,
    SPLIT_LAST,
    _hex4,
    assign_split,
    chunk_documents,
    decontaminate,
    pack_token_budget,
    profile_columns,
    redact_pii,
)
from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table, spread_small_scan

# ---------------------------------------------------------------------------
# PII fixture (the corpus has none) + SQL mirror helpers
# ---------------------------------------------------------------------------

PII_FIXTURE: list[tuple[int, str]] = [
    (200001, "reach me at alice.smith@example.com or bob+test@mail.co.uk today"),
    (200002, "call +1 555 123 4567 or (555) 987-6543 before noon"),
    (200003, "hosts 192.168.1.1 and 10.0.0.255 up; email root@status.example.org"),
    (200004, "no sensitive data in this row at all"),
]


def _docs_with_pii_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    fix = spark.createDataFrame(PII_FIXTURE, ["doc_id", "text"])
    return docs.unionByName(fix)


_SQL_PII_CORPUS = (
    "SELECT doc_id, text FROM documents UNION ALL SELECT * FROM (VALUES "
    + ", ".join(f"({i}::BIGINT, '{t}')" for i, t in PII_FIXTURE)
    + ") fixture(doc_id, text)"
)


def _sql_words(expr: str) -> str:
    return f"list_filter(string_split_regex({expr}, '\\s+'), w -> w <> '')"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


@query(
    "text_pii_redact",
    f"""
    WITH corpus AS ({_SQL_PII_CORPUS}),
    s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{PII_EMAIL}'))::BIGINT AS n_emails,
               regexp_replace(text, '{PII_EMAIL}', '[EMAIL]', 'g') AS t1
        FROM corpus
    ),
    s2 AS (
        SELECT doc_id, n_emails,
               len(regexp_extract_all(t1, '{PII_IPV4}'))::BIGINT AS n_ips,
               regexp_replace(t1, '{PII_IPV4}', '[IP]', 'g') AS t2
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, n_emails, n_ips,
               len(regexp_extract_all(t2, '{PII_PHONE}'))::BIGINT AS n_phones,
               regexp_replace(t2, '{PII_PHONE}', '[PHONE]', 'g') AS t3
        FROM s2
    )
    SELECT doc_id, n_emails, n_ips, n_phones,
           substr(md5(t3), 1, 16) AS redacted_hash
    FROM s3
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails -> IPv4s -> phone-shaped digit runs) with
    per-stage match counts; the redacted text is emitted as an md5 prefix so
    the oracle compares content without hauling full bodies. Pure
    regexp_replace chain — whole-stage codegen, no UDF. Patterns are
    Java-regex/RE2 common-subset so both engines match identically."""
    docs = _docs_with_pii_fixture(spark, sf_dir)
    r = redact_pii(F.col("text"))
    return docs.select(
        "doc_id",
        r["n_emails"].alias("n_emails"),
        r["n_ips"].alias("n_ips"),
        r["n_phones"].alias("n_phones"),
        F.substring(F.md5(r["redacted"]), 1, 16).alias("redacted_hash"),
    )


@query(
    "text_chunk_overlap",
    f"""
    WITH base AS (SELECT doc_id, text, length(text) AS n FROM documents),
    ex AS (
        SELECT doc_id, text,
               unnest(range((CASE WHEN n <= 120 THEN 1
                                  ELSE ceil((n - 120) / 90.0) + 1 END)::BIGINT)) AS chunk_idx
        FROM base
    ),
    ch AS (
        SELECT doc_id, chunk_idx, (1 + chunk_idx * 90)::BIGINT AS chunk_start,
               substr(text, 1 + chunk_idx * 90, 120) AS chunk
        FROM ex
    )
    SELECT doc_id, chunk_idx, chunk_start,
           length(chunk)::BIGINT AS n_chunk_chars,
           substr(md5(chunk), 1, 16) AS chunk_hash,
           len({_sql_words('chunk')})::BIGINT AS n_chunk_tokens
    FROM ch
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (120-char windows, 90-char
    stride): 1 -> N rows via explode(sequence) inside the scan stage — zero
    shuffles, embarrassingly parallel at any corpus size. Chunk text travels
    as an md5 prefix; count/start/length columns pin the window arithmetic."""
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return chunk_documents(docs, size=120, stride=90)


_SQL_SPLIT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '{bound}' THEN '{name}'"
        for bound, name in SPLIT_BOUNDS
    )
    + f" ELSE '{SPLIT_LAST}' END"
)


@query(
    "split_train_test",
    f"""
    SELECT doc_id,
           substr(md5(doc_id::VARCHAR), 1, 2) AS bucket,
           {_SQL_SPLIT_CASE} AS split
    FROM documents
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/valid/test assignment from
    md5(doc_id) hex-prefix thresholds — a pure function of the key, so the
    split survives repartitioning, resharding, and reruns (the property
    rand()-based splits lose when the physical layout changes). No shuffle:
    a projection over the scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = assign_split(F.col("doc_id"))
    return docs.select(
        "doc_id", a["bucket"].alias("bucket"), a["split"].alias("split")
    )


_SQL_SHINGLES3 = (
    "CASE WHEN len(ws) < 3 THEN []::VARCHAR[] "
    "ELSE list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END"
)


@query(
    "decontam_ngram_overlap",
    f"""
    WITH ev AS (
        SELECT doc_id AS eval_id, substr(text, 1, 200) AS text
        FROM documents WHERE doc_id % 97 = 0
    ),
    evtok AS (SELECT eval_id, {_sql_words('text')} AS ws FROM ev),
    evsh AS (SELECT eval_id, unnest(list_distinct({_SQL_SHINGLES3})) AS shingle FROM evtok),
    trtok AS (SELECT doc_id, {_sql_words('text')} AS ws FROM documents),
    trsh AS (SELECT doc_id, unnest(list_distinct({_SQL_SHINGLES3})) AS shingle FROM trtok)
    SELECT doc_id,
           count(DISTINCT shingle) AS n_shared_ngrams,
           count(DISTINCT eval_id) AS n_eval_docs
    FROM trsh JOIN evsh USING (shingle)
    GROUP BY doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    3-gram with the eval set (here: 200-char prefixes of every 97th doc, so
    overlap is non-vacuous by construction). Inverted-index equi-join on
    the shingle value — the shuffle is the index size, never
    |train| x |eval|; a real benchmark side is tiny and AQE broadcasts it."""
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    ev = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    return decontaminate(docs, ev)


@query(
    "pack_token_budget",
    f"""
    WITH toks AS (
        SELECT doc_id, source, len({_sql_words('text')})::BIGINT AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                 / 256.0)::BIGINT AS bin_id
    FROM toks
    """,
)
def pack_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to 256-token training bins per source
    via a running-sum window (first-fit streaming semantics — a doc's bin is
    where it STARTS, so bins overflow by at most one doc). One shuffle (the
    window partitioning); the result is a pure function of (source, doc_id)
    order, not physical layout."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_token_budget(docs, budget=256)


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
]


@query(
    "profile_table_stats",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           min({c})::VARCHAR AS min_value,
           max({c})::VARCHAR AS max_value
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-quality pass): nulls, exact distincts, min/max
    per column — ONE aggregate over ONE scan computes every statistic
    (all partial-aggregatable, k tiny partials shuffle), then the single row
    explodes to the per-column long form. Never k scans of a 100 TB table."""
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, _PROFILE_COLS)


# ---------------------------------------------------------------------------
# stratified sampling / CDC merge / SCD2 history
# ---------------------------------------------------------------------------

SAMPLE_RATES = {"en": 0.25, "de": 0.75, "es": 0.75, "fr": 0.75, "zh": 0.75}

_SQL_RATE_CASE = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{s}' THEN '{_hex4(r)}'" for s, r in sorted(SAMPLE_RATES.items())
    )
    + " ELSE '10000' END"
)


@query(
    "sample_stratified",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 4) < {_SQL_RATE_CASE}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (downsample the overrepresented
    'en' stratum to 25%, others to 75%) keyed on md5(doc_id) hex prefix —
    reproducible across runs/partitionings/engines, unlike sampleBy's
    seeded-per-partition Bernoulli. Zero shuffles: a filter in the scan
    stage."""
    from wiki_mysql_spark.operators.corpus import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, key=F.col("doc_id"), stratum_col="lang", rates=SAMPLE_RATES
    )


_MERGE_CUTOFF = "2024-01-24 00:00:00"


@query(
    "merge_upsert_profiles",
    f"""
    WITH t AS (
        SELECT user_id, count(*) AS n_events, sum(value) AS total_value,
               max(ts) AS last_ts
        FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF}' GROUP BY user_id
    ),
    s AS (
        SELECT user_id, count(*) AS n_events, sum(value) AS total_value,
               max(ts) AS last_ts
        FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF}' GROUP BY user_id
    )
    SELECT coalesce(t.user_id, s.user_id) AS user_id,
           coalesce(t.n_events, 0) + coalesce(s.n_events, 0) AS n_events,
           round(coalesce(t.total_value, 0) + coalesce(s.total_value, 0), 2)
               AS total_value,
           greatest(coalesce(t.last_ts, s.last_ts),
                    coalesce(s.last_ts, t.last_ts)) AS last_ts,
           CASE WHEN t.user_id IS NULL THEN 'insert'
                WHEN s.user_id IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM t FULL JOIN s ON t.user_id = s.user_id
    """,
)
def merge_upsert_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (CDC upsert): a late-window events batch merged into the
    prior per-user profile — full-outer join on the key, additive counters,
    greatest-timestamp, and an insert/update/keep action column. The
    set-based replacement for the reference's row-at-a-time INSERT+commit
    sink (`/root/reference/database.py:75-85`); one shuffle, and AQE
    broadcasts the (small) changes batch at scale."""
    from wiki_mysql_spark.operators.cdc import merge_upsert

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_MERGE_CUTOFF).cast("timestamp_ntz")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )

    out = merge_upsert(
        profile(ev.where(F.col("ts") < cut)),
        profile(ev.where(F.col("ts") >= cut)),
        on="user_id",
        strategies={"n_events": "sum", "total_value": "sum", "last_ts": "max"},
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        "last_ts",
        "action",
    )


@query(
    "scd2_event_type_history",
    """
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type, ts FROM marked
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
               AS is_current
    FROM starts
    """,
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a change log: collapse each user's
    event stream into attribute-value runs with half-open
    [valid_from, valid_to) validity intervals and an is_current flag —
    windowed intervals instead of destructive row updates (the reference's
    redirect pass rewrites rows in place; this is the warehouse-native
    equivalent). One shuffle: both windows share (user_id, ts) ordering."""
    from wiki_mysql_spark.operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events")
    return scd2_history(
        ev, key="user_id", attr="event_type", ts_col="ts", tiebreak="event_id"
    )


@query(
    "validate_expectations",
    """
    SELECT 'not_null:c_name' AS check_name,
           count(*) FILTER (c_name IS NULL)::BIGINT AS n_violations
    FROM customer
    UNION ALL
    SELECT 'unique:c_custkey',
           coalesce(sum(n - 1), 0)::BIGINT
    FROM (SELECT c_custkey, count(*) AS n FROM customer GROUP BY 1)
    UNION ALL
    SELECT 'unique:user_id,event_type',
           coalesce(sum(n - 1), 0)::BIGINT
    FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
    UNION ALL
    SELECT 'fk:o_custkey', count(*)::BIGINT
    FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
    WHERE o_custkey NOT IN (SELECT DISTINCT c_custkey FROM customer)
    UNION ALL
    SELECT 'fk:l_orderkey', count(*)::BIGINT
    FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
    WHERE l_orderkey NOT IN (SELECT DISTINCT o_orderkey FROM orders)
    UNION ALL
    SELECT 'range:l_quantity',
           count(*) FILTER (l_quantity IS NOT NULL
                            AND (l_quantity < 1 OR l_quantity > 50))::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'range:value',
           count(*) FILTER (value IS NOT NULL
                            AND (value < 0 OR value > 10))::BIGINT
    FROM events
    UNION ALL
    SELECT 'accepted:o_orderstatus',
           count(*) FILTER (o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F', 'P'))::BIGINT
    FROM orders
    """,
)
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (dbt-test/Deequ shape) over the
    fixture warehouse: null/unique/FK/range/accepted-value checks, each a
    pruned scan + aggregate or anti-join, unioned into one
    (check_name, n_violations) report. Includes checks designed to FAIL on
    this data (events (user_id, event_type) is far from unique; value
    exceeds 10) so the report is non-vacuous."""
    from wiki_mysql_spark.operators.validate import (
        check_accepted_values,
        check_foreign_key,
        check_not_null,
        check_range,
        check_unique,
        run_expectations,
    )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return run_expectations(
        [
            check_not_null(customer, "c_name"),
            check_unique(customer, ["c_custkey"]),
            check_unique(events, ["user_id", "event_type"]),
            check_foreign_key(orders, "o_custkey", customer, "c_custkey"),
            check_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey"),
            check_range(lineitem, "l_quantity", 1, 50),
            check_range(events, "value", 0, 10),
            check_accepted_values(orders, "o_orderstatus", ["O", "F", "P"]),
        ]
    )


@query(
    "drift_psi",
    """
    -- md5-parity split of the event stream into reference (a) and current
    -- (b) samples, 10 equi-width bins over the GLOBAL value range, PSI
    -- terms with 1e-6 smoothing. Population drift monitor for pipelines.
    WITH tagged AS (
        SELECT value,
               CASE WHEN (('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
                          % 2) = 0 THEN 'a' ELSE 'b' END AS grp
        FROM events WHERE value IS NOT NULL
    ),
    s AS (SELECT min(value) AS lo, max(value) AS hi FROM tagged),
    binned AS (
        SELECT grp,
               CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9) AS BIGINT)
                   AS bin
        FROM tagged, s
    ),
    counts AS (
        SELECT bin,
               count(*) FILTER (grp = 'a') AS n_a,
               count(*) FILTER (grp = 'b') AS n_b
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM counts)
    SELECT bin, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(n_a / t_a, 6) + 0 AS p_a,
           round(n_b / t_b, 6) + 0 AS p_b,
           round((n_a / t_a - n_b / t_b)
                 * ln((n_a / t_a + 1e-6) / (n_b / t_b + 1e-6)), 6) + 0
               AS psi_term
    FROM counts, tot
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report: split events into reference/
    current halves by md5 parity (deterministic, layout-independent), bin
    values over the global range (1-row min/max broadcast, binning is pure
    arithmetic on the scan), and emit per-bin PSI terms with epsilon
    smoothing. Two shuffles total (bin-count aggregate + the 1-row totals
    broadcast back); the corpus-monitoring primitive for detecting
    distribution shift between ingests."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    tagged = ev.select(
        "value",
        F.when(
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 2 == 0,
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("grp"),
    )
    s = tagged.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = tagged.join(F.broadcast(s)).select(
        "grp",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)),
            F.lit(9),
        )
        .cast("long")
        .alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("grp") == "a").alias("n_a"),
        F.count_if(F.col("grp") == "b").alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b"))
    p_a = F.col("n_a") / F.col("t_a")
    p_b = F.col("n_b") / F.col("t_b")
    return counts.join(F.broadcast(tot)).select(
        "bin",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (F.round(p_a, 6) + F.lit(0.0)).alias("p_a"),
        (F.round(p_b, 6) + F.lit(0.0)).alias("p_b"),
        (
            F.round((p_a - p_b) * F.log((p_a + 1e-6) / (p_b + 1e-6)), 6)
            + F.lit(0.0)
        ).alias("psi_term"),
    )


@query(
    "decontam_bloom",
    f"""
    -- the bloom prefilter is exact-after-verify, so the oracle is the plain
    -- inverted-index join; a different eval stride (% 89) than
    -- decontam_ngram_overlap keeps the two entries' answers independent
    WITH ev AS (
        SELECT doc_id AS eval_id, substr(text, 1, 200) AS text
        FROM documents WHERE doc_id % 89 = 0
    ),
    evtok AS (SELECT eval_id, {_sql_words('text')} AS ws FROM ev),
    evsh AS (SELECT eval_id, unnest(list_distinct({_SQL_SHINGLES3})) AS shingle FROM evtok),
    trtok AS (SELECT doc_id, {_sql_words('text')} AS ws FROM documents),
    trsh AS (SELECT doc_id, unnest(list_distinct({_SQL_SHINGLES3})) AS shingle FROM trtok)
    SELECT doc_id,
           count(DISTINCT shingle) AS n_shared_ngrams,
           count(DISTINCT eval_id) AS n_eval_docs
    FROM trsh JOIN evsh USING (shingle)
    GROUP BY doc_id
    """,
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination (`operators/bloom.py`):
    the eval set's shingles build a native 64 Kbit bloom (one tiny bit_or
    shuffle, <= 1024 longs to the driver), the TRAINING side is probed with
    a pure whole-stage-codegen expression BEFORE any join, and only bloom
    survivors reach the exact verify join that removes false positives —
    at 100 TB the join shuffle is sized by the contamination rate, not the
    corpus. Results are exactly the join-only implementation's (the bloom
    has no false negatives), which is what the oracle checks."""
    from wiki_mysql_spark.operators.bloom import decontaminate_bloom

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    ev = docs.where(F.col("doc_id") % 89 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    return decontaminate_bloom(docs, ev, n=3)


@query(
    "sample_weighted_reservoir",
    f"""
    -- Efraimidis-Spirakis A-Res with a DETERMINISTIC uniform: u from the
    -- md5-prefix hash of the text, weight = word count, score = ln(u)/w
    -- (log-space key; the top-k by key IS a weighted sample without
    -- replacement). Rounded before ranking; doc_id breaks rounded ties.
    WITH scored AS (
        SELECT doc_id,
               len({_sql_words('text')})::BIGINT AS w,
               round(
                   ln((('0x' || substr(md5(text), 1, 8))::BIGINT + 1)
                      / 4294967297.0)
                   / greatest(len({_sql_words('text')}), 1), 6) AS score
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, w, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM scored
    )
    SELECT doc_id, w, score FROM ranked WHERE rk <= 100
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res,
    public algorithm): each doc gets key ``ln(u) / weight`` with a
    DETERMINISTIC uniform u derived from the md5 hash of its text, and the
    global top-k by key is an exact weighted sample. One TakeOrdered top-k
    (per-partition heaps + driver merge — no global sort, no shuffle of the
    corpus); layout-independent and reproducible across engines, which is
    what lets DuckDB replay it exactly. Weight here = word count, so long
    documents are proportionally favored (token-budget-aware sampling)."""
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    from wiki_mysql_spark.functions.text import hash64, words

    w = F.greatest(F.size(words(F.col("text"))), F.lit(1)).cast("long")
    u = (hash64(F.col("text")) + 1) / F.lit(4294967297.0)
    scored = docs.select(
        "doc_id",
        F.size(words(F.col("text"))).cast("long").alias("w"),
        F.round(F.log(u) / w, 6).alias("score"),
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id").limit(100)
    )


_MIX_TARGETS: dict[str, float] = {
    # upsample a few "high-quality" sources, downsample the rest uniformly
    "src0": 0.15, "src1": 0.15, "src2": 0.10,
}


def _mix_target_rows() -> list[tuple[str, float]]:
    """Single source of truth for the target mixture — both the Spark
    broadcast table and the oracle VALUES derive from this, so the shares
    cannot drift between engines. Non-listed sources share the remainder
    uniformly (guarded: zero remainder sources -> no division at all)."""
    named = [(f"src{i}", _MIX_TARGETS[f"src{i}"]) for i in range(20)
             if f"src{i}" in _MIX_TARGETS]
    others = [f"src{i}" for i in range(20) if f"src{i}" not in _MIX_TARGETS]
    rest = ((1.0 - sum(s for _, s in named)) / len(others)) if others else 0.0
    full = dict(named, **{s: rest for s in others})
    return [(f"src{i}", full[f"src{i}"]) for i in range(20)]


def _sql_mix_targets() -> str:
    rows = ", ".join(
        # ::DOUBLE: DuckDB types bare decimal literals as DECIMAL, whose
        # division rounds differently from the float64 arithmetic Spark
        # does — the 6th digit of `weight` flips without the cast
        f"('{src}', {share!r}::DOUBLE)" for src, share in _mix_target_rows()
    )
    return f"(VALUES {rows}) t(source, target_share)"


@query(
    "corpus_mix_weights",
    f"""
    -- domain-mixture reweighting: per-source token shares vs a target
    -- mixture -> sampling weight and integer upsample epochs
    WITH tok AS (
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(len({_sql_words('text')}))::BIGINT AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens)::DOUBLE AS total FROM tok)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / total, 6) AS actual_share,
           round(target_share, 6) AS target_share,
           round(target_share / (n_tokens / total), 6) AS weight,
           ceil(target_share / (n_tokens / total))::BIGINT AS epochs
    FROM tok CROSS JOIN tot JOIN {_sql_mix_targets()} USING (source)
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting (the DoReMi/data-mixing prep step):
    compare each source's actual token share against a target mixture and
    emit the per-source sampling weight plus integer upsample epochs. One
    partial-aggregated groupBy over the corpus; targets are a broadcast
    literal table; the 1-row total joins back as a broadcast cross — no
    second corpus pass."""
    from wiki_mysql_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    targets = F.broadcast(
        docs.sparkSession.createDataFrame(
            _mix_target_rows(), ["source", "target_share"]
        )
    )
    tok = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words(F.col("text")))).cast("long").alias("n_tokens"),
    )
    tot = tok.agg(F.sum("n_tokens").cast("double").alias("total"))
    share = F.col("n_tokens") / F.col("total")
    return (
        tok.crossJoin(F.broadcast(tot))
        .join(targets, "source")
        .select(
            "source", "n_docs", "n_tokens",
            F.round(share, 6).alias("actual_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round(F.col("target_share") / share, 6).alias("weight"),
            F.ceil(F.col("target_share") / share).cast("long").alias("epochs"),
        )
    )


_URL_FIXTURE: list[tuple[int, str]] = [
    (500001, "HTTP://Example.COM:80/Path/Page?utm_source=x&id=2&b=1#frag"),
    (500002, "http://example.com/Path/Page?b=1&id=2"),
    (500003, "https://Example.com:443/other?utm_campaign=y"),
    (500004, "https://example.com/other"),
    (500005, "http://example.com/Path/Page?id=2&b=1&utm_medium=z"),
    (500006, "https://sub.example.com/other"),
    # NOT a tracking param: the name merely ends in 'utm_source' and must
    # survive canonicalization untouched (left-anchor regression case)
    (500007, "http://example.com/a?xutm_source=1&id=2"),
    # TWO utm_* params + a double-'&' run: pins the 'g' (replace-all)
    # option in the DuckDB oracle — without it only the first occurrence
    # per rule is rewritten and this row diverges between engines
    (500008, "http://example.com/a?utm_source=1&utm_medium=2&&id=2&b=1"),
]


def _sql_url_fixture() -> str:
    rows = ", ".join(f"({i}::BIGINT, '{u}')" for i, u in _URL_FIXTURE)
    return f"(VALUES {rows}) u(url_id, url)"


_SQL_URL_CANON = """
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                concat(lower(regexp_extract(url, '^([a-zA-Z]+://[^/?#]+)', 1)),
                       coalesce(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), ''),
                       CASE WHEN regexp_extract(url, '\\?([^#]*)', 1) <> ''
                            THEN concat('?', regexp_extract(url, '\\?([^#]*)', 1))
                            ELSE '' END),
                ':80(/|\\?|$)', '\\1', 'g'),
              ':443(/|\\?|$)', '\\1', 'g'),
            '([?&])utm_[a-z]+=[^&#]*', '\\1', 'g'),
          '&&+', '&', 'g'),
        '\\?&', '?', 'g'),
      '[?&]+$', '', 'g')
"""


@query(
    "text_url_normalize_dedup",
    f"""
    -- canonical form: lowercase scheme+host, default ports stripped,
    -- fragment dropped, utm_* params removed; dedup groups on the result.
    -- (Query-param SORTING is deliberately out of scope: both engines
    -- apply the identical rule set, which is what the oracle checks.)
    WITH canon AS (
        SELECT url_id, url, {_SQL_URL_CANON} AS canonical
        FROM {_sql_url_fixture()}
    )
    SELECT canonical,
           count(*)::BIGINT AS n_urls,
           min(url_id)::BIGINT AS keep_url_id
    FROM canon GROUP BY canonical
    """,
)
def text_url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (the RefinedWeb/CCNet web-corpus prep
    step): lowercase scheme+authority, strip default :80/:443 ports, drop
    the fragment, remove utm_* tracking params, then exact-dedup on the
    canonical form. Pure regexp_replace chain (Java-regex/RE2 common
    subset, like the PII redactor) + one groupBy — per-row then one
    shuffle keyed by canonical URL. The fixture covers every rule firing;
    the corpus has no URL column, so this is fixture-driven like the PII
    entry."""
    urls = spark.createDataFrame(_URL_FIXTURE, ["url_id", "url"])
    scheme_host = F.lower(F.regexp_extract("url", r"^([a-zA-Z]+://[^/?#]+)", 1))
    path = F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    qs = F.regexp_extract("url", r"\?([^#]*)", 1)
    canonical = F.concat(
        scheme_host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    # ordered, unambiguous rule set (identical non-overlapping left-to-right
    # semantics in Java regex and RE2): strip default ports, remove utm_*
    # params, then repair the separators the removal orphaned
    for pat, rep in (
        (r":80(/|\?|$)", r"$1"),
        (r":443(/|\?|$)", r"$1"),
        # LEFT-anchored on a separator so a non-tracking param whose name
        # merely ends in 'utm_...' (e.g. xutm_source) is never mangled;
        # the separator is kept and repaired by the following rules
        (r"([?&])utm_[a-z]+=[^&#]*", r"$1"),
        (r"&&+", "&"),
        (r"\?&", "?"),
        (r"[?&]+$", ""),
    ):
        canonical = F.regexp_replace(canonical, pat, rep)
    return (
        urls.select("url_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("url_id").alias("keep_url_id"),
        )
    )


@query(
    "pack_context_windows",
    f"""
    -- cross-document packing into fixed 256-token context windows: docs are
    -- concatenated in (source, doc_id) order and CUT at window boundaries,
    -- so one doc can span several windows (the training-sequence builder
    -- one step after pack_token_budget's bin ASSIGNMENT). Integer window
    -- arithmetic only — exact on both engines.
    WITH toks AS (
        SELECT doc_id, source, len({_sql_words('text')})::BIGINT AS n
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n,
               (sum(n) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n) AS off
        FROM toks WHERE n > 0
    ),
    spans AS (
        SELECT doc_id, source, n, off,
               unnest(range((off // 256)::BIGINT,
                            (((off + n - 1) // 256) + 1)::BIGINT)) AS window_id
        FROM offs
    )
    SELECT source, window_id::BIGINT AS window_id, doc_id,
           greatest(0, window_id * 256 - off)::BIGINT AS start_in_doc,
           (least(n, (window_id + 1) * 256 - off)
            - greatest(0, window_id * 256 - off))::BIGINT AS n_toks_in_window
    FROM spans
    """,
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context-window sequence packing: concatenate documents in
    (source, doc_id) order and cut every 256 tokens, emitting one row per
    (doc, window) span — including documents SPLIT across windows. One
    running-sum window (one shuffle keyed by source) + a per-row explode
    over the spanned window range; all integer arithmetic, so the oracle
    is exact. At 100 TB the shuffle is the per-source token cumsum — the
    same cost as any deterministic global ordering — and the explode is
    output-sized (each doc emits ceil(n/W)+1 rows at most)."""
    from pyspark.sql.window import Window

    W = 256
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    from wiki_mysql_spark.functions.text import words

    toks = docs.select(
        "doc_id", "source", F.size(words(F.col("text"))).cast("long").alias("n")
    ).where(F.col("n") > 0)
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = toks.withColumn("off", F.sum("n").over(w) - F.col("n"))
    spans = offs.select(
        "doc_id", "source", "n", "off",
        F.explode(
            F.sequence(
                (F.col("off") / W).cast("long"),
                ((F.col("off") + F.col("n") - 1) / W).cast("long"),
            )
        ).alias("window_id"),
    )
    start = F.greatest(F.lit(0), F.col("window_id") * W - F.col("off"))
    end = F.least(F.col("n"), (F.col("window_id") + 1) * W - F.col("off"))
    return spans.select(
        "source",
        F.col("window_id").cast("long").alias("window_id"),
        "doc_id",
        start.cast("long").alias("start_in_doc"),
        (end - start).cast("long").alias("n_toks_in_window"),
    )
