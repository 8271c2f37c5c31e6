"""Run-card composition: the r14 shared-input refactor (r13 verdict
item 5) must leave every decision table bit-identical to its
standalone, driver-certified form.

The card used to cost the plain SUM of its five arms because each arm
re-derived its inputs from scratch; it now shares (a) the collapse-
gated (doc_id, text, _g) relation + the weakest-threshold qualifying
co-occurrence between the two dedup arms and (b) the exact brute-force
top-k + the coarse-quantizer centroid literal between the two vector
arms.  These tests pin that the share points are invisible in the
output relation — arm by arm, and end to end.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _key(df):
    p = df.toPandas()
    p = p[sorted(p.columns)]
    return p.sort_values(list(p.columns)).reset_index(drop=True).to_csv(
        index=False, float_format="%.17g"
    )


def test_dedup_arms_shared_equals_standalone(spark):
    from rick_and_morty_data_pipeline_project_spark.queries.textq import (
        dedup_lsh_banding_frontier,
        dedup_threshold_frontier,
        shared_dedup_relations,
    )

    shared = shared_dedup_relations(spark, SF_SMALL)
    for fn in (dedup_lsh_banding_frontier, dedup_threshold_frontier):
        assert _key(fn(spark, SF_SMALL, _shared=shared)) == _key(
            fn(spark, SF_SMALL)
        ), fn.__name__


def test_vector_arms_shared_equals_standalone(spark):
    from rick_and_morty_data_pipeline_project_spark.queries.vecxq import (
        knn_frontier_recall_cost,
        knn_ivf_probe_frontier,
        shared_knn_relations,
    )

    shared = shared_knn_relations(spark, SF_SMALL)
    for fn in (knn_frontier_recall_cost, knn_ivf_probe_frontier):
        assert _key(fn(spark, SF_SMALL, _shared=shared)) == _key(
            fn(spark, SF_SMALL)
        ), fn.__name__


def test_whatif_standing_points_reproduce_the_card(spark):
    """Every stage's standing target sits in the middle of its what-if
    sweep (WHATIF_TARGETS), so the twin's standing-point rows must BE
    the card's selection — config, quality, cost and meets_target all
    equal.  Pins the refactor that made both queries rank the same
    _norm_union relation."""
    from rick_and_morty_data_pipeline_project_spark.queries.runcardq import (
        WHATIF_TARGETS,
        curation_run_card,
        curation_run_card_whatif,
    )

    card = {r["stage"]: r for r in curation_run_card(spark, SF_SMALL).collect()}
    standing = {s: ts[1] for s, ts in WHATIF_TARGETS.items()}
    twin = curation_run_card_whatif(spark, SF_SMALL).collect()
    assert len(twin) == 15  # 5 stages x 3 policy points
    mid = [r for r in twin if r["target_min"] == standing[r["stage"]]]
    assert len(mid) == 5
    for r in mid:
        c = card[r["stage"]]
        assert (
            r["config"], r["quality_value"], r["cost_value"],
            r["meets_target"],
        ) == (
            c["config"], c["quality_value"], c["cost_value"],
            c["meets_target"],
        ), r["stage"]


def test_run_card_selects_one_row_per_stage(spark):
    from rick_and_morty_data_pipeline_project_spark.queries.runcardq import (
        curation_run_card,
    )

    rows = curation_run_card(spark, SF_SMALL).collect()
    stages = sorted(r["stage"] for r in rows)
    assert stages == [
        "ann_index",
        "dedup_threshold",
        "ivf_probes",
        "lsh_banding",
        "quality_threshold",
    ]
    for r in rows:
        assert r["meets_target"] in (0, 1)
        assert r["config"] is not None
