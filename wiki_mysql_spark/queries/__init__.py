"""Import every query module so registration side-effects populate the
registry; expose the merged QUERIES/ORACLE dicts."""

from wiki_mysql_spark.queries import (  # noqa: F401  (registration side-effects)
    analytics,
    formats,
    functions_lib,
    llm_data,
    multimodal_queries,
    pipeline_ops,
    relational,
    search,
    streaming_queries,
    tpch_extra,
    udf_surface,
    wiki,
)
from wiki_mysql_spark.queries.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
