"""N-gram language-model perplexity scoring for corpus filtering — the
CCNet recipe (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"; also used by RedPajama/Dolma):
train a small LM on a trusted reference corpus, score every crawled
document's perplexity under it, and keep the least-perplexing ("head")
slice. The reference pipeline has no quality scoring at all (its filters
are structural, ``/root/reference/filters.py``); this is north-star
surface for the 100 TB training-data pipeline.

Model: add-one-smoothed bigram LM over lowercased alphabetic tokens,
p(w2|w1) = (c2(w1 w2) + 1) / (c1(w1) + V), trained on the reference slice
only. Scoring follows the repo's cross-engine determinism idiom (the DSIR
entry): each bigram's log-probability is scaled to an exact BIGINT
(round(ln(p) * 1e6)), so per-document accumulation is order-independent
integer addition; the single double division happens once at the end in a
pinned operation order, making Spark and the DuckDB oracle bit-comparable.

Scale shape: two map-side-combined count shuffles over the REFERENCE
slice (unigrams, bigrams — the LM), one equi-join of the corpus's
exploded bigrams against each count table (inverted-index shape: sized by
n-gram collisions, never |corpus| x |LM|), one per-doc aggregate. A hot
bigram ("of the") is a hot PROBE key against a 1-row build side — the
benign direction of skew; AQE's skew-join split covers the residue. No
windows, no driver collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log-probabilities are scaled by this and rounded to BIGINT so per-doc
#: sums are exact integer arithmetic (order-independent across engines).
LM_LOG_SCALE = 1_000_000


def _alpha_words(text: Column) -> Column:
    """Lowercased whitespace tokens restricted to ^[a-z]+$ — the same
    normalization the DSIR entry uses, so the two quality signals read
    the same token stream."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
        lambda w: w.rlike("^[a-z]+$"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    *,
    ref_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average bigram log-probability under an add-one-
    smoothed LM trained on the ``ref_cond`` slice of ``docs``, plus the
    CCNet head-split flag. Returns one row per input document:

    - ``n_bigrams`` — scored bigram count (0 for docs with < 2 alpha
      words, which cannot be scored);
    - ``lp_sum`` — exact scaled log-probability sum (BIGINT, 1e-6 nats);
    - ``avg_logprob`` — lp_sum / n_bigrams / 1e6, rounded to 6 (display);
    - ``keep`` — true iff the document is NO MORE perplexing than the
      corpus average (raw average logprob >= the corpus-wide mean, both
      built from exact integers in a pinned operation order — the
      CCNet head/tail split with the corpus mean as the cut). Unscorable
      docs are never kept.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _alpha_words(F.col(text_col)).alias("ws"),
        ref_cond.alias("_is_ref"),
    )
    # bigrams with their conditioning word, exploded once; checkpointed —
    # the reference counts AND the corpus scoring both read this
    n = F.size("ws")
    pairs = F.when(
        n < 2, F.array().cast("array<struct<w1:string,bg:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at("ws", i).alias("w1"),
                F.concat_ws(
                    " ", F.element_at("ws", i), F.element_at("ws", i + 1)
                ).alias("bg"),
            ),
        )
    )
    toks = base.select(
        "doc_id", "_is_ref", "ws", pairs.alias("pairs")
    ).localCheckpoint(eager=False)

    ref = toks.where(F.col("_is_ref"))
    c1 = (
        ref.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    c2 = (
        ref.select(F.explode("pairs").alias("p"))
        .groupBy(F.col("p.bg").alias("bg"))
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    # V = reference vocabulary size — the add-one denominator's smoothing
    # mass. Computed eagerly (one tiny job over the checkpointed ref
    # slice) so an EMPTY reference fails loudly here: with V=0 and all
    # n1=0 the denominator is 0, and Spark's non-ANSI Divide yields NULL
    # where DuckDB's IEEE division yields inf — the engines would diverge
    # instead of erroring (r12 advice). The collected count then rides
    # the per-bigram expression as a literal (one fewer 1-row
    # broadcast-nested-loop join than the broadcast-DataFrame spelling).
    v_size = int(c1.agg(F.count(F.lit(1)).alias("v")).collect()[0]["v"])
    if v_size == 0:
        raise ValueError(
            "bigram_lm_scores: ref_cond selects no scorable reference "
            "documents — the reference vocabulary is empty, so the "
            "add-one denominator would be 0 and every score undefined"
        )

    bg = toks.select(
        "doc_id", F.explode("pairs").alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    lp = (
        F.round(
            F.log(
                (F.coalesce(F.col("n2"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(v_size)).cast(
                    "double"
                )
            )
            * LM_LOG_SCALE
        )
        .cast("long")
        .alias("lp")
    )
    scored = (
        bg.join(c2, "bg", "left")
        .join(c1.withColumnRenamed("w", "w1"), "w1", "left")
        .select("doc_id", lp)
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").alias("lp_sum"),
    ).localCheckpoint(eager=False)  # per-doc rows + the corpus mean read it
    # corpus mean in the SAME exact-integer space: one 1-row broadcast
    tot = F.broadcast(
        agg.agg(
            F.coalesce(F.sum("lp_sum"), F.lit(0)).alias("t"),
            F.coalesce(F.sum("n_bigrams"), F.lit(0)).alias("nn"),
        )
    )
    # raw doubles from exact integers, identical operation order both
    # engines: sum -> /count -> /scale. Threshold on RAW, round for display.
    doc_avg = F.col("lp_sum").cast("double") / F.col("n_bigrams") / LM_LOG_SCALE
    corpus_avg = F.col("t").cast("double") / F.col("nn") / LM_LOG_SCALE
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .crossJoin(tot)
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("lp_sum", F.lit(0).cast("long")).alias("lp_sum"),
            (F.round(doc_avg, 6) + 0.0).alias("avg_logprob"),
            F.coalesce(doc_avg >= corpus_avg, F.lit(False)).alias("keep"),
        )
    )
