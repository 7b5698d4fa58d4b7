"""Plan-shape regression tests: the scale contract, pinned.

A correct-but-badly-planned operator is a failure at 100 TB; these
assert the physical properties each operator's design depends on.
"""

import __spark_entry__ as E
from cross_modal_multivector_search_spark.plans import audit_report, plan_text

# NOTE: use sf0.01 here, not sf0.001 — other test modules cache() the
# sf0.001 embeddings, and Spark substitutes the cached InMemoryRelation
# into matching plan subtrees, hiding the parquet scan's PushedFilters.
from conftest import SF_T2 as SF_SMOKE


def test_knn_broadcasts_queries_and_group_limits(spark):
    df = E.queries()["knn_ip_topk"](spark, SF_SMOKE)
    rep = audit_report(df, execute=True)
    # query-side filter reaches the scan; queries broadcast; top-k via
    # WindowGroupLimit (per-partition partial top-k, no global sort)
    assert rep["pushed_filters"]
    assert rep["broadcast_join"]
    assert rep["window_group_limit"]
    assert rep["whole_stage_codegen"]


def test_chamfer_broadcasts_query_members(spark):
    df = E.queries()["chamfer_topk"](spark, SF_SMOKE)
    rep = audit_report(df)
    assert rep["broadcast_join"]
    assert rep["window_group_limit"]


def test_pricing_summary_scan_prunes_columns(spark):
    df = E.queries()["pricing_summary"](spark, SF_SMOKE)
    text = plan_text(df)
    # 6 of 11 lineitem columns read; shipdate filter pushed to parquet
    assert "PushedFilters: [IsNotNull(l_shipdate)" in text
    assert "l_orderkey" not in text.split("ReadSchema")[1].split("\n")[0]


def test_ivf_probes_before_distance_math(spark):
    df = E.queries()["ivf_topk"](spark, SF_SMOKE)
    rep = audit_report(df)
    assert rep["broadcast_join"]      # centroids + queries broadcast
    assert rep["window_group_limit"]


def test_gemm_paths_scan_only_needed_columns(spark):
    df = E.queries()["knn_ip_topk_gemm"](spark, SF_SMOKE)
    text = plan_text(df)
    scan_schema = text.split("ReadSchema:")[-1].split("\n")[0]
    assert "embedding" in scan_schema
    assert "label" not in scan_schema  # pruned: GEMM path reads id+vec only
