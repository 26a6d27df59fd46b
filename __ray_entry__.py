"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship validation pipeline on sf0.001: profile the events table,
    attach per-row Tukey/MAD evidence + anomaly score/label, and compute
    per-partition verdicts (SURVEY §3.1-§3.2 re-expressed as two
    streaming Ray Data jobs)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from autoprepad_ray.pipelines.flagship import validate_numeric_table

    ds = rd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "pid", pc.cast(pc.bit_wise_and(t["user_id"], 7), pa.int64())),
        batch_format="pyarrow")
    result = validate_numeric_table(ds, ["value"], partition_col="pid")
    # materialize the small verdicts side so both jobs execute
    result.verdicts.to_pandas()
    return result.enriched.select_columns(
        ["event_id", "value", "value_TUKEY", "value_Z_MOD",
         "Tukey_Total", "MAD_Total", "AnomalyScore", "AnomalyLabel"])


# Queries the round-3 driver gate already verified green (CORRECTNESS_r03).
# The gate covered only the first 50 registry entries, so rotate these BEHIND
# the not-yet-driver-verified ones; new round-4 queries land in front too.
_R03_DRIVER_COVERED = frozenset({
    "profile_lineitem_stats", "tukey_flags_events", "mad_flags_events",
    "anomaly_scores_events", "partition_verdicts_events",
    "robust_scale_quantity", "duplicate_partsupp_keys",
    "distinct_counts_lineitem", "orphan_suppkeys", "pricing_summary",
    "top_customers", "date_encode_events", "psi_events_value",
    "psi_event_type", "exact_dedup_lineitem", "doc_fingerprints",
    "text_quality_docs", "token_totals_by_lang", "pattern_shapes_customer",
    "nan_canonicalize_sources", "spearman_quantity_price",
    "ann_topk_embeddings", "ngram_jaccard_docs", "cc_orders_sharing_part",
    "minhash_neardup_docs", "minhash_dedup_clusters", "simhash_neardup_docs",
    "embed_neardup_planted", "langid_docs", "hll_distinct_lineitem",
    "image_validation_verdicts", "phash_neardup_pairs",
    "mode_orderpriority", "z_flags_events", "missing_bitpattern_lineitem",
    "ks_events_value", "histogram_events_value", "ordinal_encode_priority",
    "ffill_events_by_user", "bit_patterns_partnames",
    "mixed_experiment_metrics", "preprocess_events_matrix",
    "top_anomalies_events", "join_order_revenue_by_status",
    "tukey_flags_pooled_lineitem", "ivf_topk_embeddings", "pca_scores_events",
    "csv_roundtrip_region", "bfill_events_by_user",
    "iterative_impute_lineitem",
})


def _ordered_registry():
    from autoprepad_ray.pipelines.queries import REGISTRY

    fresh = {n: q for n, q in REGISTRY.items() if n not in _R03_DRIVER_COVERED}
    seen = {n: q for n, q in REGISTRY.items() if n in _R03_DRIVER_COVERED}
    return {**fresh, **seen}


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: q.sql for name, q in _ordered_registry().items()
            if q.sql is not None}
