"""Oracle-differential tests: every registered query vs its DuckDB twin.

Mirrors the driver's correctness gate (row-count + schema + order-insensitive
value comparison at sf0.01) so regressions surface locally before a round
verify. Comparison is strict on column names and on values normalized to
strings (floats via repr of float64, timestamps via isoformat), sorted
row-wise — i.e. order-insensitive multiset equality.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_CORRECTNESS
from wiki_mysql_spark.queries import ORACLE, QUERIES


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm_cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            if v == int(v) and abs(v) < 2**52:
                return str(int(v))
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "tolist"):  # numpy arrays / lists
            return str([norm_cell(x) for x in v.tolist()])
        if isinstance(v, (list, tuple)):
            return str([norm_cell(x) for x in v])
        return str(v)

    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


ORACLED = sorted(ORACLE.keys())
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, duck):
    got = QUERIES[name](spark, SF_CORRECTNESS).toPandas()
    want = duck.sql(ORACLE[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    dtype_diffs = []
    for c in got.columns:
        a, b = str(got[c].dtype), str(want[c].dtype)
        if a != b and not (a.startswith("datetime64") and b.startswith("datetime64")):
            dtype_diffs.append((c, a, b))
    assert not dtype_diffs, f"{name}: dtype mismatch {dtype_diffs}"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = normalize(got), normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_no_rows_only_entries():
    """Every registry entry must carry a DuckDB oracle — the rows-only
    (weaker, count-only) tier stays empty. This replaced a parametrized
    runner over ROWS_ONLY that pytest reported as a confusing 'skipped'
    once the set became empty."""
    assert ROWS_ONLY == [], f"entries without oracles: {ROWS_ONLY}"
