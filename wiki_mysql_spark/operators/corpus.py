"""Corpus-preparation operators for LLM training-data pipelines: PII
redaction, overlapping document chunking, deterministic train/valid/test
splitting, benchmark decontamination, and token-budget sequence packing.

(North-star extensions — the reference has no corpus tooling beyond its
cleaning chain, ``/root/reference/filters.py:52-64``; these are the
operations a 100 TB pretraining pipeline runs right after that cleaning.)

Design rules shared by every operator here:

  * pure column expressions (regexp / higher-order functions / windows) so
    the work stays inside whole-stage codegen and each operator has an
    exact DuckDB oracle;
  * no driver-side state and no all-pairs joins — decontamination joins on
    the shingle value (one shuffle keyed by shingle, sized by the inverted
    index, never |train| x |eval|);
  * determinism under repartitioning — splits hash content-stable keys
    (md5), packing orders by explicit unique keys, never partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.text import shingles_of, words

# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, ASCII word boundaries.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ()]{6,}\d"


def redact_pii(text: Column) -> dict[str, Column]:
    """Redact emails -> IPv4s -> phone-shaped digit runs, in that order,
    counting matches at each stage (counts are computed on the text as it
    looked when that stage ran, matching the replacement semantics).

    Returns {"redacted", "n_emails", "n_ips", "n_phones"} columns.
    """
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL)).cast("long")
    t1 = F.regexp_replace(text, PII_EMAIL, "[EMAIL]")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4)).cast("long")
    t2 = F.regexp_replace(t1, PII_IPV4, "[IP]")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE)).cast("long")
    t3 = F.regexp_replace(t2, PII_PHONE, "[PHONE]")
    return {"redacted": t3, "n_emails": n_emails, "n_ips": n_ips, "n_phones": n_phones}


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 120,
    stride: int = 90,
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (size - stride chars shared between consecutive chunks) — the context-
    window chunker of a pretraining / RAG ingestion pipeline.

    1 -> N rows via explode(sequence(...)); the chunk count per doc is
    ``1 + ceil((n - size) / stride)`` (always >= 1, so empty docs still
    yield one empty chunk and no data silently disappears). Embarrassingly
    parallel: no shuffle at all — the explode happens inside the scan stage.
    """
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        (F.ceil((n - F.lit(size)) / F.lit(float(stride))) + 1).cast("int")
    )
    start = (F.lit(1) + F.col("chunk_idx") * stride).cast("long")
    chunk = F.substr(F.col(text_col), start, F.lit(size))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("chunk_start"),
            F.length(chunk).cast("long").alias("n_chunk_chars"),
            F.substring(F.md5(chunk), 1, 16).alias("chunk_hash"),
            F.size(words(chunk)).cast("long").alias("n_chunk_tokens"),
        )
    )


# hex-prefix thresholds: 'cd'/256 ~ 0.80, 'e7'/256 ~ 0.90 -> 80/10/10 split
SPLIT_BOUNDS = [("cd", "train"), ("e7", "valid")]
SPLIT_LAST = "test"


def assign_split(key: Column) -> dict[str, Column]:
    """Deterministic train/valid/test assignment from a content-stable key:
    first two hex chars of md5(key) compared lexicographically against fixed
    bounds. Stable under repartitioning, resharding, and reruns — the split
    is a pure function of the key, never of physical placement (the property
    `rand()`-based splits lose the moment the input layout changes).
    """
    bucket = F.substring(F.md5(key.cast("string")), 1, 2)
    split = F.lit(SPLIT_LAST)
    for bound, name in reversed(SPLIT_BOUNDS):
        split = F.when(bucket < bound, F.lit(name)).otherwise(split)
    return {"bucket": bucket, "split": split}


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Flag training documents sharing any word n-gram with an evaluation
    benchmark set (the decontamination pass every serious pretraining corpus
    runs before training).

    Both sides explode to distinct shingles; the equi-join on the shingle
    value is the only shuffle, keyed by shingle — its size is the inverted
    index, never |train| x |eval|. The eval side of a real pipeline is tiny
    (benchmarks), so AQE broadcast-joins it at scale.

    Returns one row per contaminated training doc: (doc_id,
    n_shared_ngrams, n_eval_docs) — distinct shingles shared and distinct
    benchmark docs hit.
    """

    def sh(df: DataFrame, idc: str) -> DataFrame:
        tok = df.select(F.col(idc), words(F.col(text_col)).alias("ws"))
        return tok.select(
            idc, F.explode(F.array_distinct(shingles_of(F.col("ws"), n))).alias("shingle")
        )

    return (
        sh(train, train_id)
        .join(sh(eval_df, eval_id), "shingle")
        .groupBy(train_id)
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct(eval_id).alias("n_eval_docs"),
        )
    )


def stratified_sample(
    df: DataFrame,
    *,
    key: Column,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the 4-hex-char
    md5 prefix of its key falls below the stratum's rate threshold
    (rate * 65536, rendered as 4 hex digits, compared lexicographically).

    Unlike ``df.sampleBy`` this is a pure function of the key — the sample
    is reproducible across runs, partitionings, and engines (which is what
    makes it oracle-checkable, and what a rebuildable training corpus
    needs). Zero shuffles: a filter over the scan.
    """
    bucket = F.substring(F.md5(key.cast("string")), 1, 4)
    thr = F.lit(_hex4(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex4(rate))).otherwise(thr)
    return df.where(bucket < thr)


def _hex4(rate: float) -> str:
    """rate in [0,1] -> 4-hex-digit threshold ('10000' at exactly 1.0 so
    every 4-char bucket compares below it)."""
    n = min(int(rate * 65536), 65536)
    return f"{n:04x}" if n < 65536 else "10000"


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile — one row per column with null count, exact
    distinct count, and min/max (stringified so heterogeneous column types
    share one output schema).

    Single pass: ONE aggregate computes every per-column statistic
    simultaneously (count/countDistinct/min/max are all partial-aggregatable,
    so the scan is read once and only k tiny partials shuffle), then the
    1-row result explodes into the long per-column form. Never k scans.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def pack_token_budget(
    docs: DataFrame,
    *,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed token-budget bins (sequence packing for
    training batches): within each group, documents in a deterministic
    order fill bins by running token count; a document starts a new bin
    when its predecessor's cumulative count crosses the budget.

    ``bin_id = floor((cumsum - n_tokens) / budget)`` — the bin is decided by
    where the doc STARTS, so bins can overflow by at most one document
    (first-fit streaming semantics, same answer on any partitioning because
    the window order is total). One shuffle: the window partition-by.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        F.col(order_col),
        F.col(group_col),
        F.size(words(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        order_col,
        group_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(budget))).alias("bin_id"),
    )
