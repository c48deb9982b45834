from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from wiki_mysql_spark.sources.tables import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from wiki_mysql_spark.session import get_session

    s = get_session("wiki_mysql_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views, the
    same way the driver's oracle does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{SF_CORRECTNESS}/{name}.parquet'"
        )
    yield con
    con.close()
