"""Relevance search over the documents corpus: BM25 top-k retrieval and
per-document TF-IDF keyword extraction — the retrieval/indexing half of an
LLM-data pipeline (quality-filter by keyword relevance, build dedup-aware
search indexes). The reference has no text-query surface at all; its
closest hook is the body-text column it materializes
(``/root/reference/sql/init.sql:5-9``).

Scale notes: document-frequency and corpus statistics are tiny aggregates
(one row per query term / one scalar row) joined back by broadcast; the
only big-side shuffles are the per-(doc, term) counts. The BM25 path
pre-filters with ``arrays_overlap`` BEFORE exploding, so non-matching
documents never produce token rows — at 100 TB that is the difference
between exploding the whole corpus and exploding the small matching slice.

All floating-point math is derived from exact integer counts through
identical expression trees on both engines (ln/divide/multiply are
IEEE-deterministic); only the final per-document term-sum is
order-sensitive, so it alone is rounded at the emit boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table

QUERY_TERMS = ("spark", "join", "merge")
K1 = 1.2
B = 0.75
TOP_K = 20

_SQL_WS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def _tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split("text", r"\s+"), lambda w: w != F.lit(""))
    return docs.select("doc_id", F.size(ws).alias("dl"), ws.alias("ws"))


@query(
    "text_bm25_topk",
    f"""
    WITH d AS (
        SELECT doc_id, {_SQL_WS} AS ws FROM documents
    ),
    dd AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dd),
    tok AS (SELECT doc_id, dl, unnest(ws) AS term FROM dd),
    tf AS (
        SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
        FROM tok WHERE term IN ('spark', 'join', 'merge')
        GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * ({K1} + 1.0)
               / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))
           ), 6) + 0 AS bm25
    FROM tf JOIN dfreq USING (term), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {TOP_K}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for a fixed conjunctive query. Corpus stats (N, avgdl)
    and per-term document frequencies are broadcast scalars/3-row dims;
    matching docs are pre-filtered with arrays_overlap before the explode
    so the token fan-out only touches the candidate slice. Ties after
    rounding break by doc_id on both engines."""
    docs = _tokenized_docs(spark, sf_dir)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = F.array(*[F.lit(t) for t in QUERY_TERMS])
    tok = (
        docs.where(F.arrays_overlap("ws", terms))
        .select("doc_id", "dl", F.explode("ws").alias("term"))
        .where(F.col("term").isin(*QUERY_TERMS))
    )
    # tf is consumed twice (document frequencies + final score join); a lazy
    # localCheckpoint materializes the small candidate-slice aggregate once
    # instead of re-scanning + re-exploding the corpus for each consumer.
    tf = (
        tok.groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    per_term = (
        idf
        * F.col("tf")
        * F.lit(K1 + 1.0)
        / (F.col("tf") + F.lit(K1) * (1.0 - B + F.lit(B) * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.round(F.sum(per_term), 6) + F.lit(0.0)).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(TOP_K)
    )


@query(
    "text_tfidf_keywords",
    f"""
    WITH d AS (
        SELECT doc_id, {_SQL_WS} AS ws FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM d),
    tok AS (SELECT doc_id, unnest(ws) AS term FROM d),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
    s AS (
        SELECT doc_id, term,
               tf * (ln((1.0 + n_docs) / (1.0 + df_t)) + 1.0) AS score
        FROM tf JOIN dfreq USING (term), n
    ),
    r AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rk
        FROM s
    )
    SELECT doc_id, term, round(score, 6) + 0 AS tfidf, rk
    FROM r WHERE rk <= 3
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (smoothed sklearn-style idf).
    Scores are exact-integer-derived doubles computed by the identical
    expression tree on both engines, so the per-document ranking (tie-broken
    by term) is deterministic without rounding; rounding happens only on the
    emitted score column."""
    docs = _tokenized_docs(spark, sf_dir)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select("doc_id", F.explode("ws").alias("term"))
    # tf feeds both the df aggregate and the score join — pin it once.
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    score = F.col("tf") * (
        F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df_t"))) + 1.0
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .select("doc_id", "term", score.alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            (F.round("score", 6) + F.lit(0.0)).alias("tfidf"),
            "rk",
        )
    )
