"""wiki_mysql_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
kaniblu/wiki-mysql (a Wikipedia-dump -> MySQL ETL pipeline), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
Parquet at rest, Structured Streaming for event data, plus the LLM-data-
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB training-data pipeline needs.

Layout:
    session.py    SparkSession factory tuned for the target workload
    sources/      table catalog + wiki XML dump source
    functions/    column-level function library (cleaning, text, vectors)
    operators/    composite operators (redirect fixpoint, dedup, similarity)
    plans/        end-to-end pipelines (the wiki ETL)
    streaming/    Structured Streaming jobs over the events table
    queries/      the query registry exposed through __spark_entry__
"""

__version__ = "0.1.0"
