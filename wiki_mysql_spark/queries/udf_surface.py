"""UDF/UDAF/UDTF surface (SURVEY.md §2.8 — U3 [absent] in the reference,
whose only UDF-shape is the WikiBodyFilter scalar callable, U1).

Covers the remaining Python-boundary shapes with Arrow transfer: grouped-agg
pandas UDF (UDAF) and applyInPandas (grouped map). These are deliberately
NOT the hot path for anything built-in — each docstring names the native
equivalent the oracle uses — they exist to prove the boundary works and to
host genuinely custom math at 100 TB (one Arrow batch per group-partition).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table


@query(
    "udaf_geomean_pandas",
    """
    SELECT o_orderstatus,
           round(exp(avg(ln(o_totalprice))), 4) AS geomean_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def udaf_geomean_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas UDF (geometric mean).
    Native equivalent exp(avg(ln(x))) is the oracle; the UDF computes in
    log-space the same way so the comparison is meaningful."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).sum() / len(v)))

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        # NB: a GROUPED_AGG pandas UDF cannot be mixed with JVM aggregates
        # in one agg() — Spark raises INVALID_PANDAS_UDF_PLACEMENT
        .agg(F.round(geomean("o_totalprice"), 4).alias("geomean_price"))
    )


@query(
    "udf_applyinpandas_zscore",
    """
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) + 0 AS bal_zscore
    FROM customer
    """,
)
def udf_applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-segment z-score normalization — the
    'whole group as one pandas frame' shape (feature normalization, per-group
    model scoring). Oracle is the equivalent window SQL."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "bal_zscore": ((bal - bal.sum() / len(bal)) / bal.std(ddof=1)).round(4) + 0.0,
            }
        )

    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_custkey long, bal_zscore double")
    )


@query(
    "agg_median_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(median(o_totalprice), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles/median (sort-based aggregate). The
    approx path for 100 TB is approx_percentile (t-digest) — sketched,
    mergeable, one pass — exposed rows-only below."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.median("o_totalprice"), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@query(
    "agg_approx_percentile",
    """
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS approx_median_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the single-pass mergeable scale path.
    Oracle-able because the GK sketch runs in EXACT mode while a group fits
    its accuracy budget (1e6 here covers every correctness-gate SF), where
    its answer is the discrete ceil-rank order statistic — verified equal to
    DuckDB's quantile_disc. At production scale groups exceed the budget and
    the same query degrades gracefully to the approximate estimate."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(1_000_000)
            ).alias("approx_median_price")
        )
    )


@query(
    "udf_cogroup_balance_gap",
    """
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           round(coalesce(c.avg_cust_bal, 0.0) - coalesce(s.avg_supp_bal, 0.0), 4) AS balance_gap
    FROM (SELECT c_nationkey AS nk, avg(c_acctbal) AS avg_cust_bal FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, avg(s_acctbal) AS avg_supp_bal FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def udf_cogroup_balance_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: both sides of a key arrive as two pandas
    frames per group — the custom-join shape (feature joins, per-key model
    scoring against reference data). Oracle: the equivalent agg + full
    outer join."""

    def gap(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        nk = left["c_nationkey"].iloc[0] if len(left) else right["s_nationkey"].iloc[0]
        cust = float(left["c_acctbal"].sum() / len(left)) if len(left) else 0.0
        supp = float(right["s_acctbal"].sum() / len(right)) if len(right) else 0.0
        return pd.DataFrame({"nationkey": [int(nk)], "balance_gap": [round(cust - supp, 4)]})

    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    supp = load_table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    return (
        cust.groupBy("c_nationkey")
        .cogroup(supp.groupBy("s_nationkey"))
        .applyInPandas(gap, "nationkey int, balance_gap double")
    )


_SENT_FIXTURE: list[tuple[int, str]] = [
    (400001, "First sentence. Second one! Third? "),
    (400002, "no terminal punctuation at all"),
    (400003, "..."),
]
_SQL_SENT_FIXTURE = ", ".join(
    f"({i}::BIGINT, '{t}')" for i, t in _SENT_FIXTURE
)


@query(
    "udtf_sentence_split",
    f"""
    -- the same split rule replayed in SQL: segments on [.!?]+ runs,
    -- SPACE-trimmed (trim() default — the Python side strips ' ' only, for
    -- parity on tab/other whitespace), empties dropped, document order
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
        UNION ALL
        SELECT * FROM (VALUES {_SQL_SENT_FIXTURE}) f(doc_id, text)
    ),
    segs AS (
        SELECT doc_id,
               list_filter(list_transform(
                   string_split_regex(text, '[.!?]+'), s -> trim(s)),
                   s -> s <> '') AS l
        FROM corpus
    )
    SELECT doc_id, i::INT AS sent_idx, l[i + 1] AS sentence
    FROM segs, unnest(range(len(l))) t(i)
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python user-defined table function (Spark 4 ``@udtf``,
    Arrow-optimized): one input row fans out to N sentence rows — the U3
    table-function shape the reference lacks entirely. Sentence rule kept
    engine-replayable (split on ``[.!?]+`` runs, trim, drop empties) so the
    oracle is exact. Not the hot path for plain splitting (posexplode of a
    native split is — see fn_explode_posexplode); this entry proves the
    LATERAL Python-table-function boundary works, where genuinely custom
    per-row expansion logic would live at 100 TB."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for seg in re.split(r"[.!?]+", text):
                # strip SPACES only: DuckDB's trim() default is spaces, and
                # str.strip() (all whitespace) would silently diverge on
                # tabs/vertical whitespace around sentence boundaries
                seg = seg.strip(" ")
                if seg:
                    yield idx, seg
                    idx += 1

    spark.udtf.register("udtf_sentence_split_fn", SentenceSplit)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 97 == 0
    ).select("doc_id", "text")
    fix = spark.createDataFrame(_SENT_FIXTURE, ["doc_id", "text"])
    corpus = docs.unionByName(fix)
    corpus.createOrReplaceTempView("udtf_sentence_corpus")
    return spark.sql(
        """
        SELECT c.doc_id, s.sent_idx, s.sentence
        FROM udtf_sentence_corpus c,
             LATERAL udtf_sentence_split_fn(c.text) s
        """
    )
