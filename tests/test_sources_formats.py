"""Source-format round-trips (SURVEY §2.1 breadth): the engine reads the
same relation identically from parquet, CSV, and JSON line files — schema
applied explicitly (no inference in pipelines), compression handled by the
codec layer. The reference reads exactly one format (bz2'd XML); these are
the formats a Spark-first warehouse additionally ingests every day."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from wiki_mysql_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def nation_pq(spark):
    return load_table(spark, SF_SMOKE, "nation")


def _assert_same(a, b):
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_csv_roundtrip_with_explicit_schema(spark, nation_pq, tmp_path):
    path = str(tmp_path / "nation_csv")
    nation_pq.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(nation_pq.schema).option("header", True).csv(path)
    _assert_same(nation_pq, back)


def test_csv_gzip_roundtrip(spark, nation_pq, tmp_path):
    path = str(tmp_path / "nation_csv_gz")
    nation_pq.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
    back = spark.read.schema(nation_pq.schema).option("header", True).csv(path)
    _assert_same(nation_pq, back)


def test_jsonl_roundtrip_with_explicit_schema(spark, nation_pq, tmp_path):
    path = str(tmp_path / "nation_json")
    nation_pq.write.mode("overwrite").json(path)
    back = spark.read.schema(nation_pq.schema).json(path)
    _assert_same(nation_pq, back)


def test_csv_malformed_rows_are_quarantined(spark, tmp_path):
    """PERMISSIVE read routes broken rows to _corrupt_record instead of
    dropping them silently (the reference drops bad pages on the floor,
    `/root/reference/dbfy.py:142-143` — we keep them auditable)."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,a\nnot_an_int,b\n2,c\n")
    df = (
        spark.read.schema("k INT, v STRING, _corrupt_record STRING")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["k"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not_an_int" in bad[0]["_corrupt_record"]


def test_json_props_column_parses_from_events(spark):
    """events.props is JSON-in-string; from_json with an explicit schema
    yields typed fields (no schema inference in the pipeline path)."""
    ev = load_table(spark, SF_SMOKE, "events").limit(100)
    parsed = ev.select(F.from_json("props", "k BIGINT").alias("p")).select("p.k")
    assert parsed.where(F.col("k").isNotNull()).count() > 0


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other splittable columnar format Spark reads natively;
    round-trip with predicate pushdown intact."""
    out = str(tmp_path / "orc")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "val"]
    ).write.orc(out)
    back = spark.read.orc(out)
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]
    filtered = back.where(F.col("id") >= 2)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert filtered.count() == 2
    assert "PushedFilters" in plan and "GreaterThanOrEqual(id,2)" in plan
