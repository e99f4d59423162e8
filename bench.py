"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop sink (full execution, no
collect/driver cost). Timings are end-to-end per query including plan
time — the same thing a user of the engine pays.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 2) and reports
the MIN: a 40-query single-JVM session occasionally hits multi-second
environment stalls (GC/compilation pauses — the round-2 driver run
recorded one query at 17× its reproducible time), and the min of two
runs measures the engine rather than the pause. Caches are query-scoped
(plans/registry.py), so repetitions recompute from the source — the min
is a true cold-cache time, not a cache hit.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "order_wide_enriched",
    "pricing_summary",
    "order_detail_interval_join",
    "visitor_repair",
    "uv_dedup",
    "bounce_detect",
    "sessionize",
    "hourly_stats",
    "topk_users_by_spend",
    "revenue_rollup",
    "revenue_cube",
    "routing_facts",
    "purchase_asof_view",
    "user_value_distribution",
    "engaged_user_overlap",
    "skew_salted_join",
    "doc_text_profile",
    "doc_quality_lang",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cascade_verify",
    "simhash_near_dup",
    "dedup_embedding_cosine",
    "cosine_topk_bruteforce",
    "ann_ivf_bucketed",
    "ann_srp_lsh",
    "ann_srp_multiprobe",
    "cdc_envelope_parse",
    "sliding_stats",
    "doc_top_token",
    "doc_clean_normalize",
    "pii_scrub",
    "doc_sample_split",
    "doc_length_quantiles",
    "doc_pack_bins",
    "contamination_4gram",
    "sql_function_surface",
    "vocab_top_tokens",
    "corpus_summary",
    "corpus_filter_pipeline",
    "training_mix_weighted",
    "packed_training_stream",
    "winnow_near_dup",
    "span_dedup_rewrite",
    "doc_repetition_profile",
    "doc_hash_classifier_score",
    "doc_chunk_windows",
    "chunk_bm25_topk",
    "curriculum_mixture",
    "ann_pq_adc",
    "dsir_importance_weights",
    "per_source_cap",
    "image_ahash_near_dup",
    "audio_pcm_features",
    "stratified_exact_sample",
    "gram_df_cms_estimate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from gmall_flink_parent_spark.session import get_spark
    from gmall_flink_parent_spark import plans

    spark = get_spark("gmall-bench")
    # ERROR-only logging for the bench session: the driver's tail capture
    # is finite, and benign WARNs (WindowExec on the tiny-summary frames —
    # #partitions-row / 20-row windows, single-partition by construction)
    # flooded the BENCH_r06 tail. The JSON line must own the tail.
    spark.sparkContext.setLogLevel("ERROR")
    qmap = plans.query_map()

    # JVM/codegen warmup on the smallest SF so headline timings measure
    # the engine, not first-query initialization.
    qmap["pricing_summary"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    # 3 reps: this microVM carries variable external load (observed
    # load-average ~6 with zero local processes); with 2 reps one noisy
    # rep pollutes half the min-pool, with 3 the min survives a single
    # stall and the spread diagnosis keys off a real sample.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        worst = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            worst = max(worst, dt)
        timings[name] = round(best, 3)
        spreads[name] = round(worst / best, 2) if best > 0 else 1.0

    # Host-stall self-diagnosis: on this microVM a stalled sweep inflates
    # *every* query's slow rep uniformly (BENCH_r04 recorded 3-25x across
    # the board; the same code measured 0.61x baseline on an idle machine).
    # A median max/min spread over ~2x across reps is that signature —
    # label the artifact so a stalled run is distinguishable without
    # re-running (SCALE.md "host stall" section).
    ordered = sorted(spreads.values())
    if not ordered:
        median_spread = 1.0
    elif len(ordered) % 2:
        median_spread = ordered[len(ordered) // 2]
    else:  # even count: true median, not the upper-middle element
        median_spread = round(
            (ordered[len(ordered) // 2 - 1] + ordered[len(ordered) // 2]) / 2, 2
        )
    stall_suspect = reps >= 2 and median_spread > 2.0

    total = round(sum(timings.values()), 3)
    # Keep the stdout line COMPACT: the driver's tail capture is finite and
    # BENCH_r05.json lost its head (total included) once per-query rep_spread
    # doubled the line length. Per-query mins + the stall verdict go to
    # stdout; the full spread diagnosis goes to a local file.
    try:  # host pressure at sweep end — the stall-adjudication context
        loadavg = [round(x, 1) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "stall_suspect": stall_suspect,
        "median_rep_spread": median_spread,
        "loadavg": loadavg,
        "queries": timings,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump({**compact, "rep_spread": spreads, "reps": reps}, fh, indent=1)
    except OSError:
        pass  # diagnosis file is best-effort; the stdout line is the artifact
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
