"""Multimodal plumbing as oracle-checked queries: the native metadata path
and the Arrow/mapInPandas feature path must both reproduce what DuckDB
computes over the same bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_features,
    extract_features,
    payload_metadata,
)
from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table


def _payload_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_binary_payload(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native (no-Python) metadata over a binary payload column — the path
    that must stay pruned-scan-fast at 100 TB (payload column untouched)."""
    return payload_metadata(_payload_docs(spark, sf_dir))


@query(
    "multimodal_features_arrow",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same features computed through the Arrow-batched mapInPandas hot
    path — proves the multimodal batch plumbing (schema, batching, binary
    round-trip) is byte-correct, not just the native expressions."""
    return extract_features(_payload_docs(spark, sf_dir))


@query("multimodal_decode_stub")  # rows-only: fake decoder has no SQL twin
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake image-decode (real codec stubbed behind
    NotImplementedError) exercising the decode-shaped mapInPandas plumbing."""
    return decode_image_features(_payload_docs(spark, sf_dir), fake=True)
