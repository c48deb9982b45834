"""MediaWiki dump source (SURVEY.md S1-S3).

The reference streams ``bz2.BZ2File`` through gensim's ``extract_pages``
(``/root/reference/dbfy.py:188-191,228-233``) on one machine. Spark-first:

  * Spark's XML source reads each FILE whole (measured: one task per file,
    compressed or not), so single-file dumps parse on one core. The scale
    recipe is the multistream/part-file layout Wikipedia already publishes —
    one task per part. Downstream stages are decoupled from input splits:
    the pipeline repartitions after the parse (plans/wiki_pipeline.py).
  * Spark 4's built-in XML source (``format("xml"), rowTag="page"``) does the
    page parsing with a pushable schema; the namespace filter becomes a
    Catalyst predicate instead of gensim's ``("0",)`` argument.
  * The dump's ``<redirect title=.../>`` attribute arrives as a proper
    column, so redirect detection (F7) doesn't even need the regex on the
    happy path — the body regex stays as fallback for dumps without the
    attribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Subset of the mediawiki <page> element the pipeline needs; pruning the
# schema here prunes the parse (spark-xml only materializes requested fields).
PAGE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ns", LongType()),
        StructField("title", StringType()),
        StructField(
            "redirect",
            StructType([StructField("_title", StringType())]),
        ),
        StructField(
            "revision",
            StructType([StructField("text", StringType())]),
        ),
    ]
)


def read_wiki_dump(
    spark: SparkSession, path: str, *, namespaces: tuple[int, ...] = (0,)
) -> DataFrame:
    """Read a mediawiki XML dump (optionally .bz2) into the raw_pages shape
    ``(aid, title, ns, text, redirect_title)``.

    Equivalent to ``extract_pages(bz2.BZ2File(path), ("0",))`` at
    ``/root/reference/dbfy.py:188-189`` but distributed: the ns filter is a
    pushed predicate, and only the projected fields are parsed.
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "page")
        .schema(PAGE_SCHEMA)
        .load(path)
    )
    return (
        raw.where(F.col("ns").isin(list(namespaces)))
        .select(
            F.col("id").alias("aid"),
            F.col("title"),
            F.col("ns").cast("int").alias("ns"),
            F.col("revision.text").alias("text"),
            F.col("redirect._title").alias("redirect_title"),
        )
    )
