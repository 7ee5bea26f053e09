"""Every gate query must emit a driver-canonicalizable (atomic) schema.

The driver's correctness gate canonicalizes each query's output with
pandas (sort columns by name, sort row tuples, hash).  A list/struct/map
cell is unhashable there, so any ``queries()`` entry that returns a
nested column fails the gate even when the values are oracle-correct
(round 8: ``frequent_sequences_events``).  This guard builds every gate
query's plan at sf0.001 and asserts the analyzed schema contains only
atomic types — no ArrayType, MapType, or StructType — so no future
operator reintroduces the landmine.
"""

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR

NESTED = (T.ArrayType, T.MapType, T.StructType)


def _atomic_offenders(spark, names):
    import __spark_entry__ as entry

    qs = entry.queries()
    offenders = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        bad = [f"{f.name}:{f.dataType.simpleString()}"
               for f in df.schema.fields
               if isinstance(f.dataType, NESTED)]
        if bad:
            offenders[name] = bad
    return offenders


def _driver_proven() -> set:
    """Queries whose schema the driver has already hashed AND whose
    gate function is unchanged since.  Source of truth is the committed
    manifest tests/gate_proven.json (regenerated from GIT-TRACKED
    CORRECTNESS files by scripts/update_gate_proven.py), keyed on
    (query name, md5 of the gate function source): editing or rewiring
    a ``_q_*`` voids its exemption, so a stale green row can never mask
    a newly-nested schema.  Untracked working-tree artifacts grant no
    exemption."""
    import hashlib
    import inspect
    import json
    import os

    import __spark_entry__ as entry

    def source_hash(fn) -> str:
        # must stay identical to scripts/update_gate_proven.py
        return hashlib.md5(inspect.getsource(fn).encode()).hexdigest()

    path = "/root/repo/tests/gate_proven.json"
    if not os.path.exists(path):
        return set()
    manifest = json.load(open(path))
    qs = entry.queries()
    return {name for name, h in manifest.items()
            if name in qs and source_hash(qs[name]) == h}


# Queries whose CONSTRUCTION runs bounded driver-side jobs (iterative
# fits, capped collects): building their plan in the smoke canary costs
# real cluster time, and their schemas are covered by the slow-tier
# full check + the driver gate itself.
_PLAN_TIME_JOBS = {
    "pagerank_lineitem", "stationary_distribution_events",
    "label_propagation_lineitem", "textrank_keywords_documents",
    "isotonic_calibration_orders", "pca_embeddings",
    "mmd_drift_embeddings", "ipf_weights_documents",
    "uplift_curve_orders", "auuc_orders",
    "pattern_profile_customer",
    # round-11: IRLS fit / max_points guard / corr collect run
    # bounded jobs at plan build
    "ipw_att_orders", "ses_forecast_events", "partial_corr_lineitem",
    "ols_orders", "cox_ph_events", "concordance_index_events",
    "poisson_reg_orders", "propensity_match_orders",
    "fellegi_sunter_orders", "procrustes_embeddings",
    "binary_segmentation_events", "platt_scaling_orders",
    "markov_attribution_events", "temperature_scaling_orders",
    "two_model_uplift_orders", "zca_whitening_embeddings",
    # round-12: max_points / max_cells guards collect at plan build
    "holt_forecast_events", "kendall_tau_lineitem",
    # round-12: the whole GESD walk runs at construction
    "seasonal_esd_events",
    # round-12: IRLS / count-collect fits at construction
    "huber_regression_orders", "bandit_report_events",
    # round-13: IRLS fit / guard counts + eager checkpoint at
    # construction
    "quantile_reg_orders", "knn_shapley_embeddings",
    "interarrival_events", "label_shift_orders",
    "grid_cluster_customer",
}


def test_gate_window_schema_is_atomic(spark):
    """Smoke tier: the driver-window queries WITHOUT a prior
    driver-green row (the only ones that can still carry the nested-
    schema landmine), minus the declared plan-time-job queries.  The
    slow tier checks the full registry."""
    import __spark_entry__ as entry

    fresh = [n for n in entry._GATE_ORDER[:50]
             if n not in _driver_proven()
             and n not in _PLAN_TIME_JOBS]
    offenders = _atomic_offenders(spark, fresh)
    assert not offenders, (
        "driver-window queries with nested output columns (the "
        f"driver's pandas canonicalizer cannot hash them): {offenders}")


def test_every_gate_query_schema_is_atomic(spark):
    """Slow tier (conftest SLOW_TESTS): the full registry, so a future
    rotation can never bring a nested-output query into the window."""
    import __spark_entry__ as entry

    offenders = _atomic_offenders(spark, list(entry.queries()))
    assert not offenders, (
        "gate queries with nested output columns (driver's pandas "
        f"canonicalizer cannot hash them): {offenders}")


def test_gate_order_is_a_registry_subset(spark):
    """The driver samples the first 50 names; they must resolve."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    oracles = entry.oracle_sql()
    unknown = [k for k in oracles if k not in qs]
    assert not unknown, f"oracle_sql keys not in queries(): {unknown}"
