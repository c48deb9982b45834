"""Physical-plan regression guards: the properties that make these queries
scale are asserted structurally, so a future edit that silently loses a
pushdown, a broadcast, or a top-k short-circuit fails here rather than only
showing up as a slow bench. (PLANS_r2.md is the narrative audit; these are
its load-bearing claims as tests.)
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_CORRECTNESS
from wiki_mysql_spark.queries import QUERIES


def _plan(name: str, spark) -> str:
    df = QUERIES[name](spark, SF_CORRECTNESS)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")  # full node details, no line truncation
    return buf.getvalue()


def test_scan_filter_project_pushdown(spark):
    plan = _plan("scan_filter_project", spark)
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    # projection pruned to exactly the needed columns
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipdate" not in read


def test_q5_all_dims_broadcast(spark):
    plan = _plan("q5_revenue_by_nation", spark)
    # formatted explain lists each node in the tree AND a detail section,
    # so require at least the four tree occurrences
    assert plan.count("BroadcastHashJoin") >= 4, (
        "star join must broadcast all four dimension sides"
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sort_topk_uses_take_ordered(spark):
    plan = _plan("sort_topk_global", spark)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan, "top-k must not global-sort"


def test_theta_join_not_cartesian(spark):
    plan = _plan("join_theta_residual", spark)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_no_cartesian_and_checkpointed_sigs(spark):
    plan = _plan("dedup_embedding_lsh", spark)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # both join sides must read the one materialized signature frame
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_text_queries_have_no_shuffle(spark):
    for name in ["text_quality", "text_repetition_ratio"]:
        plan = _plan(name, spark)
        assert "Exchange" not in plan, f"{name} must stay per-row (no shuffle)"


@pytest.mark.parametrize("name", ["wiki_clean_markup", "multimodal_metadata"])
def test_metadata_queries_prune_scan(spark, name):
    plan = _plan(name, spark)
    if "ReadSchema:" in plan:
        read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "embedding" not in read


def test_interval_join_is_equi_not_cartesian(spark):
    plan = _plan("join_interval_points", spark)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_substring_spans_no_cartesian_single_shingle_pass(spark):
    plan = _plan("dedup_substring_spans", spark)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # both consumers (dup-shingle agg + join-back) must read the one
    # checkpointed shingle materialization, not re-explode the corpus
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_fuzzy_editdist_skew_path_no_cartesian(spark):
    plan = _plan("dedup_fuzzy_editdist", spark)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
