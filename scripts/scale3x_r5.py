#!/usr/bin/env python
"""3× scaling points for the round-4/5 operators without measured entries in
SCALE.md's scaling tables.

Builds id-shifted 3× replications of sf0.1's documents / events / lineitem
(fresh id populations per copy, light text perturbation so near-dup ops
still do work), then times each operator at 1× and 3× in one warmed
session, min over N iters. Prints a JSON table {op: {"1x": s, "3x": s}}.

Usage: python scripts/scale3x_r5.py   (env: SCALE3X_OPS=comma-list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("SCALE3X_ITERS", "2"))
FACTOR = 3
SHIFT = 100_000_000

DEFAULT_OPS = [
    "dedup_pagerank_step",
    "dedup_source_overlap_matrix",
    "text_bm25_topk",
    "text_tfidf_source_terms",
    "events_markov_transitions",
    "events_dau_wau_stickiness",
    "market_basket_part_pairs",
    "rfm_customer_segments",
]

#: which table each op scans (only that table is replicated; the rest
#: symlink to the 1x files)
OP_TABLE = {
    "similarity_mrl_prefix_topk": "embeddings",
    "similarity_mrl_r_sweep": "embeddings",
    "similarity_bq_hamming_topk": "embeddings",
    "similarity_bq_r_sweep": "embeddings",
    "similarity_mrl_truncation_sweep": "embeddings",
    "text_heldout_perplexity": "documents",
    "events_watermark_lateness_audit": "events",
    "events_watermark_delay_sweep": "events",
    "events_session_gap_sweep": "events",
    "similarity_ivf_pq_refine_topk": "embeddings",
    "events_scd2_intervals": "events",
    "pipeline_domain_caps": "documents",
    "pipeline_clean_corpus_v3": "documents",
    "text_bigram_lm_score": "documents",
    "similarity_ivf_pq_topk": "embeddings",
    "dedup_incremental_simhash": "documents",
    "dedup_simhash_hamming": "documents",
    "dedup_simhash_hamming_sweep": "documents",
    "dedup_incremental_two_day_near": "documents",
    "dedup_incremental_two_day_exact": "documents",
    "dedup_incremental_near": "documents",
    "dedup_incremental_semantic": "embeddings",
    "pipeline_incremental_ingest": "documents",
    "pipeline_incremental_artifact_delta": "documents",
    "dedup_pagerank_step": "documents",
    "dedup_source_overlap_matrix": "documents",
    "text_bm25_topk": "documents",
    "text_tfidf_source_terms": "documents",
    "events_markov_transitions": "events",
    "events_dau_wau_stickiness": "events",
    "market_basket_part_pairs": "lineitem",
    "rfm_customer_segments": "orders",
    "similarity_int8_quantize": "embeddings",
    "dedup_jaccard_threshold_sweep": "documents",
    "pipeline_pack_efficiency": "documents",
    "dedup_source_minhash_similarity": "documents",
    "text_vocab_growth": "documents",
    "similarity_centroid_drift": "embeddings",
    "events_funnel_latency": "events",
    "parts_abc_pareto": "lineitem",
    "text_ngram_entropy": "documents",
    "events_path_topk": "events",
    "multimodal_ahash_dedup": "documents",
    "dedup_cluster_stats": "documents",
    "events_categorical_drift": "events",
    "events_incremental_rollup": "events",
    "orders_seasonality_index": "orders",
    # round-6 semantic changes (NULL guards, locf, hex digests)
    "events_resample_gapfill": "events",
    "events_json_extract": "events",
    "multimodal_frame_sample": "documents",
    "pipeline_chunk_documents": "documents",
    "text_token_count": "documents",
    # round-7 semantic change (integral-suffix rlike gate on the quota)
    "pipeline_stratified_sample": "documents",
    # round-7 additions (containment verify + rare-shingle probe index)
    "dedup_containment": "documents",
    "dedup_containment_probe": "documents",
    "events_rate_spike_zscore": "events",
    # round-8 additions (composed overlap spectrum; IVF balance report)
    "dedup_overlap_spectrum": "documents",
    "similarity_ivf_balance": "embeddings",
    # round-8 addition (SemDeDup-style transitive cosine clusters)
    "dedup_semantic_clusters": "embeddings",
    # round-8 addition (per-stage curation attrition funnel)
    "pipeline_filter_funnel": "documents",
    # round-8 addition (cross-split semantic contamination report)
    "similarity_semantic_decontaminate": "embeddings",
    # round-8 addition (composed image-curation manifest)
    "multimodal_clean_manifest": "documents",
    # round-9 addition (cross-modal caption-image pair dedup)
    "multimodal_paired_dedup": "documents",
    # round-9 addition (five-layout LSH tuning sweep from one signature)
    "dedup_lsh_band_tuning": "documents",
    # round-9 addition (cosine-threshold calibration grid)
    "similarity_semantic_tau_sweep": "embeddings",
    # round-10 addition (v2 flagship: four dedup families, attributed).
    # documents is the corpus-proportional input (quality/exact/near/
    # paired all scale with it); the 1x embeddings stay attached, so the
    # semantic drop list covers only base-id docs — the replicated ids
    # carry no embeddings, exactly like a production corpus slice whose
    # embedding run hasn't caught up
    "pipeline_clean_corpus_v2": "documents",
    # round-11 addition (fourth incremental sibling: cross-modal pair keys)
    "dedup_incremental_paired": "documents",
    # round-11 addition (v2 incremental capstone: four-stage waterfall)
    "pipeline_incremental_ingest_v2": "documents",
    # round-11 addition (the four-stage capstone's append bill)
    "pipeline_incremental_artifact_delta_v2": "documents",
    # round-13 addition (IVF nprobe recall/cost curve from one build)
    "similarity_ivf_probe_sweep": "embeddings",
    # round-13 addition (PQ bytes-vs-recall geometry grid from one scan)
    "similarity_pq_geometry_sweep": "embeddings",
}


def _replicate(spark, table: str, out_dir: str) -> None:
    import pyspark.sql.functions as F

    from iceberg_explorer_spark.sources.registry import load_table

    base = load_table(spark, SF_DIR, table)
    copies = []
    for i in range(FACTOR):
        c = base
        if table == "documents":
            c = c.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
            # perturb the tail so copies are NEAR-dups (LSH work), not
            # exact dups collapsed upstream
            c = c.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copyline {i}"))
            )
        elif table == "events":
            c = c.withColumn(
                "event_id", F.col("event_id") + F.lit(i * SHIFT)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT))
        elif table == "lineitem":
            c = c.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT)
            )
        elif table == "orders":
            c = c.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * SHIFT))
        elif table == "embeddings":
            c = c.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )


def main() -> None:
    from iceberg_explorer_spark.operators import QUERIES
    from iceberg_explorer_spark.session import build_session

    ops = os.environ.get("SCALE3X_OPS")
    ops = ops.split(",") if ops else DEFAULT_OPS
    spark = build_session(
        app_name="scale3x_r5",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    results: dict[str, dict[str, float]] = {}
    try:
        tables_needed = sorted({OP_TABLE[o] for o in ops})
        scaled_dir = "/tmp/scale3x_r5"
        os.makedirs(scaled_dir, exist_ok=True)
        for t in tables_needed:
            p = os.path.join(scaled_dir, f"{t}.parquet")
            # a SYMLINK is the 1x fill-in from a previous invocation with a
            # different op set — replicate over it, or the "3x" point would
            # silently time 1x data
            if os.path.islink(p):
                os.unlink(p)
            if not os.path.exists(p):
                _replicate(spark, t, scaled_dir)
        # any table an op does NOT scan still resolves at 1x via symlink
        for f in os.listdir(SF_DIR):
            dst = os.path.join(scaled_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SF_DIR, f), dst)

        for name in ops:
            point: dict[str, float] = {}
            for label, d in (("1x", SF_DIR), ("3x", scaled_dir)):
                best = None
                for _ in range(ITERS):
                    t0 = time.perf_counter()
                    QUERIES[name].builder(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                point[label] = round(best, 3)
            results[name] = point
            print(json.dumps({name: point}))
    finally:
        spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
