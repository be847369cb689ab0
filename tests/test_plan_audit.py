"""Catalog-wide physical-plan audit: NO query in the driver contract
may plan a Cartesian product, a row-at-a-time Python UDF, an
undeclared Arrow/pandas eval node, or an unbounded global sort.
(Complements the targeted assertions in test_plans.py.)"""

from __future__ import annotations

import pytest

from opengauss_tools_datachecker_performance_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"

#: documented Arrow-batched paths (multimodal decode, t-digest UDAF,
#: binary-Avro codec — no spark-avro jar in the pip distro — and the
#: BLAS gemm top-k, whose whole point is the Arrow batch boundary)
ALLOW_ARROW = {
    "multimodal_features",
    "drift_tdigest",
    "frame_sample_plan",
    "debezium_avro_binary",
    "cosine_topk_fast",
    "multimodal_resize",
}

#: documented BroadcastNestedLoopJoin users — bounded by construction:
#: cosine_topk is the |Q|-broadcast exactness baseline (corpus never
#: shuffles); ann_ivf broadcasts the n_cells≈16 centroid frame into the
#: assignment pass; drift_quantile_profile cross-joins the ONE-row
#: global-quantile aggregate into the per-group frame. Everything else
#: must stay equi-join only.
#: embedding_near_dup_ivf shares ann_ivf's centroid broadcast (its
#: candidate pair join itself is a cell equi-join — see the targeted
#: assertion in test_operators_wave3)
#: lm_surprisal / tfidf_top_terms cross-join a ONE-row scalar
#: aggregate (vocabulary size / corpus size) into the scored frame
#: (same shape as drift_quantile_profile's global quantiles)
ALLOW_BNLJ = {
    "cosine_topk",
    "ann_ivf",
    "drift_quantile_profile",
    "embedding_near_dup_ivf",
    "lm_surprisal",
    "tfidf_top_terms",
    # shares ann_ivf's broadcast-centroid assignment pass
    "semantic_decontaminate",
    # broadcast 16-row PQ codebook into the encode/LUT passes (same
    # shape as ann_ivf's centroid broadcast)
    "ann_ivf_pq",
    # inherits lm_surprisal's ONE-row vocab-scalar cross join (the
    # scoring subtree feeding the prune)
    "budget_prune",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_plan_is_clean(spark, name):
    plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in ALLOW_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: non-equi join planned as BNLJ (O(n*m) at scale)"
        )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in ALLOW_ARROW:
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan, f"{name}: undeclared Python node {node}"
    if "rangepartitioning" in plan:
        assert "TakeOrderedAndProject" in plan or name in ALLOW_ARROW, (
            f"{name}: unbounded global sort"
        )
