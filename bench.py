"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the north-rule image-validation pipeline over
a cached synthetic F-IMG table.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": .., "num_cpus": N,
   "images_per_sec": ...}

``--scaling`` runs the same bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 and reports throughput at both plus the scaling
efficiency (rate32/rate8)/4 — the sandbox substitute for the N vs 4N
node criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


BENCH_QUERIES = [
    "profile_lineitem_stats",
    "tukey_flags_events",
    "anomaly_scores_events",
    "partition_verdicts_events",
    "pricing_summary",
    "exact_dedup_lineitem",
    "duplicate_partsupp_keys",
    "spearman_quantity_price",
    "psi_events_value",
    "date_encode_events",
    "minhash_neardup_docs",
    "ngram_jaccard_docs",
    "ann_topk_embeddings",
    "ks_events_value",
    "ffill_events_by_user",
    "preprocess_events_matrix",
    "top_anomalies_events",
    "ordinal_encode_priority",
    "pca_scores_events",
    "bfill_events_by_user",
    "iterative_impute_lineitem",
    "audio_features_clips",
    "video_frame_neardup_pairs",
    "asof_join_events_orders",
    "range_join_purchase_window",
    "rolling_window_events",
    "sessionize_events",
    "top_events_per_user",
    "json_roundtrip_nation",
    "heavy_hitters_quantity",
    "cc_orders_sharing_part",
    "minhash_dedup_clusters",
    "tumbling_window_counts",
    "group_quantiles_events",
    "deterministic_split_events",
    "ntile_events_value",
    "decontaminate_docs",
    "pack_documents_bins",
    "vocab_top_terms_docs",
    "percent_rank_events",
    "pivot_event_type_counts",
    "semi_join_urgent_customers",
    "rollup_pricing_levels",
    "stratified_sample_events",
    "hopping_window_counts",
    "top_term_per_doc",
    "group_distinct_users_events",
    "running_total_docs",
    "constant_columns_events_clicks",
    "pii_mask_events_props",
    "bm25_docs",
    "label_centroids_embeddings",
    "config_validate_events",
    "pattern_branch_orders",
    "bpe_token_counts_docs",
    "chunk_documents_overlap",
    "embed_dedup_clusters",
    "kmedoid_pattern_similarity_parts",
    "phash_dedup_clusters_images",
    "gopher_quality_docs",
    "unigram_logprob_docs",
    "bigram_repetition_docs",
    "source_mixture_weights",
    "token_drift_sources",
    "dup_doc_ratio_by_source",
    "vocab_jaccard_source_pairs",
    "token_budget_resample_sources",
    "corpus_assembly_funnel",
    "normalize_text_docs",
    "length_quantile_filter_docs",
    "dense_rank_orders_price",
    "sliding_distinct_users_7d",
    "prefix_dup_docs",
    "label_centroid_cosine_pairs",
    "oov_rate_docs",
    "entropy_docs",
    "asof_forward_next_purchase",
    "shard_layout_docs",
    "trimmed_mean_events",
    "top_bigrams_per_source",
    "interarrival_quantiles_users",
    "bloom_semi_join_lineitem",
    "winsorize_events_value",
    "crossdoc_gram_coverage_docs",
    "editdist_blocked_pairs_partnames",
    "above_avg_order_customers",
    "sq8_topk_embeddings",
    "feather_roundtrip_supplier",
    "psi_daily_event_type",
    "fd_violations_part_supp",
    "benford_totalprice",
    "reconcile_order_totals",
    "unpivot_lineitem_measures",
    "suffix_dup_docs",
    "vocab_growth_docs",
    "copart_mutual_knn_suppliers",
    "copart_triangles_suppliers",
    "training_shuffle_positions",
    "systematic_sample_docs",
    "snapshot_diff_user_counts",
    "dup_cluster_size_histogram",
    "resample_daily_locf_events",
    "pareto_frontier_orders",
    # session-9: the remaining registry entries, so the bench suite IS
    # the full 145-query registry.  image_validation_verdicts and
    # phash_neardup_pairs are the two exclusions — they re-run the
    # F-IMG pipeline that the dedicated image benchmark above already
    # times (double-counting ~25 s of decode for no new signal).
    "mad_flags_events",
    "robust_scale_quantity",
    "distinct_counts_lineitem",
    "orphan_suppkeys",
    "top_customers",
    "psi_event_type",
    "doc_fingerprints",
    "text_quality_docs",
    "token_totals_by_lang",
    "pattern_shapes_customer",
    "nan_canonicalize_sources",
    "simhash_neardup_docs",
    "embed_neardup_planted",
    "langid_docs",
    "hll_distinct_lineitem",
    "mode_orderpriority",
    "z_flags_events",
    "missing_bitpattern_lineitem",
    "histogram_events_value",
    "bit_patterns_partnames",
    "mixed_experiment_metrics",
    "join_order_revenue_by_status",
    "tukey_flags_pooled_lineitem",
    "ivf_topk_embeddings",
    "csv_roundtrip_region",
    "text_roundtrip_nation",
    "word_repetition_docs",
    "user_event_sequences",
    "cube_pricing_levels",
    "left_join_customer_orders",
    "quota_sample_docs",
    "full_outer_user_day_activity",
    "cross_join_region_nation",
    "setops_orderkeys_by_flag",
    "json_extract_events_props",
    "session_stats_events",
    "cohort_retention_events",
    "funnel_stages_events",
    "event_transition_counts",
    "hll_distinct_users_per_day",
]

IMG_PARTITIONS = 32
IMG_ROWS = 60000  # 1.92M images (F-SCALE shape) -> ~26 GB of payloads


def _consume(res) -> int:
    """Drive a result to completion without materializing on the driver."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for batch in res.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
            n += batch.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return 0


def _wait_quiet() -> list:
    """Hold the bench until the box is quiet (load1 below
    GRAFT_QUIET_LOAD, default 3.0), bounded by GRAFT_QUIET_WAIT_SEC
    (default 900; 0 disables the gate).  Single-query walls swing
    3-5x when a neighbor loads the host (hypervisor steal is
    LOAD-TRIGGERED here — see BASELINE.md), so an un-gated capture
    measures the neighbor, not the code.

    The gate runs AFTER the bench's own warm-up, so it keys on the
    1-MINUTE average: the bench's own fixture/warm-up load decays out
    of load1 in ~a minute while genuine neighbor load persists —
    load5 would stall minutes on self-generated load (and, under
    --scaling, on the previous child's).  Returns [load1, load5] at
    release time for the output record."""
    limit = float(os.environ.get("GRAFT_QUIET_LOAD", "3.0"))
    budget = float(os.environ.get("GRAFT_QUIET_WAIT_SEC", "900"))
    waited = 0.0
    while True:
        l1, l5 = [float(x) for x in
                  open("/proc/loadavg").read().split()[:2]]
        if l1 < limit or waited >= budget:
            if budget and waited >= budget and l1 >= limit:
                print(f"# bench: never quiet (load1={l1}) after "
                      f"{waited:.0f}s — timing under load",
                      file=sys.stderr)
            return [l1, l5]
        time.sleep(30)
        waited += 30


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from autoprepad_ray.context import quiet_data_context
    quiet_data_context()

    from autoprepad_ray.fixtures import ensure_fimg
    from autoprepad_ray.pipelines.image_validation import validate_images
    from autoprepad_ray.pipelines.queries import REGISTRY

    # cached clean image table (generation excluded from timing; shared
    # across the two scaling runs via the /tmp cache)
    img_dir, _ = ensure_fimg(partitions=IMG_PARTITIONS, rows=IMG_ROWS,
                             inject=False, use_ray=True)
    # media + sf-scaled image fixtures likewise generated outside
    # timing (/tmp caches; the sf-scaled F-IMG feeds the phash queries)
    from autoprepad_ray.pipelines.queries import _fimg_for_sf, _fmedia_for_sf
    _fmedia_for_sf(sf_dir)
    _fimg_for_sf(sf_dir)

    # Warm-up: (a) spawn + import-warm the Ray worker pool — parquet
    # count() is metadata-only and spawns nothing, so without a real
    # map the FIRST timed stage absorbs multi-second worker cold-start
    # and reads as a flat non-scaling cost; (b) pull the payload bytes
    # through the page cache so we measure compute+shuffle, not disk.
    import pyarrow as _pa

    import ray.data as rd
    for t in ["lineitem", "events", "documents", "embeddings", "orders"]:
        rd.read_parquet(f"{sf_dir}/{t}.parquet").count()
    rd.read_parquet(f"{img_dir}/images", columns=["bytes"]) \
        .map_batches(lambda t: _pa.table({"n": [t.num_rows]}),
                     batch_format="pyarrow", zero_copy_batch=True).count()

    # gate AFTER fixture generation/warm-up: a cold F-IMG cache takes
    # ~12 min to build, long enough for a quiet window sampled before
    # it to have expired by the time timing starts
    load_at_start = _wait_quiet()

    queries: dict[str, float] = {}

    img_only = os.environ.get("GRAFT_BENCH_IMG_ONLY") == "1"
    reps = 3 if img_only else 1
    t_img = float("inf")
    img_passes = {}
    for _ in range(reps):
        t0 = time.perf_counter()
        rep = validate_images(f"{img_dir}/images",
                              f"{img_dir}/captions.parquet")
        assert len(rep.verdicts) == IMG_PARTITIONS
        dt = time.perf_counter() - t0
        if dt < t_img:
            t_img = dt
            img_passes = rep.timings
    queries["image_validation"] = round(t_img, 3)
    n_images = IMG_PARTITIONS * IMG_ROWS

    for name in ([] if img_only else BENCH_QUERIES):
        t0 = time.perf_counter()
        _consume(REGISTRY[name].fn(sf_dir))
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "validation+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpu,
        "images": n_images,
        "images_per_sec": round(n_images / t_img, 1),
        "image_validation_passes": img_passes,
        "loadavg_at_start": load_at_start,
    }
    ray.shutdown()
    return out


def run_scaling(suite: bool = False) -> None:
    def run(ncpu: int) -> dict:
        # the scaling criterion is on the HEADLINE validation pipeline
        # (north rule: images/sec); the sf-query suite has sub-second
        # members whose fixed scheduling overhead is not what N->4N
        # measures.  --scaling-suite additionally times the full query
        # suite at both levels (recorded in BASELINE.md, informational)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        if not suite:
            env["GRAFT_BENCH_IMG_ONLY"] = "1"
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # each CPU level runs once here; the best-of-3 repetition happens
    # INSIDE the img-only child (reps=3 under GRAFT_BENCH_IMG_ONLY), so
    # the reported rate per level is already a best-of-3 — single passes
    # vary ±15% with OS cache and background load
    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    eff_img = (r_hi["images_per_sec"] / r_lo["images_per_sec"]) / (hi / lo)
    out = {
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "images_per_sec_8": r_lo["images_per_sec"],
        "images_per_sec_32": r_hi["images_per_sec"],
        "scaling_efficiency_images": round(eff_img, 3),
        "passes_8": r_lo["image_validation_passes"],
        "passes_32": r_hi["image_validation_passes"],
    }
    if suite:
        out["scaling_efficiency_suite_total"] = round(
            (r_lo["value"] / r_hi["value"]) / (hi / lo), 3)
        out["queries_8"] = r_lo["queries"]
        out["queries_32"] = r_hi["queries"]
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling-suite" in sys.argv:
        run_scaling(suite=True)
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
