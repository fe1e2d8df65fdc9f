"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the `noop` sink: the full physical plan runs
(scan → shuffle → agg) without collect() driver-marshalling noise.

Each query gets one untimed warm-up execution, then the reported number is
the min of two timed runs: the first execution of a plan shape pays 3-10 s
of one-time whole-stage-codegen compilation and Python-worker startup that
has nothing to do with data-path throughput (measured: advanced_query_dsl
12.2 s cold vs 3.5 s warm at sf0.1) — steady-state is what scales to the
real corpus, and min-of-2 suppresses box noise.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nshm2022db_spark.session import get_spark  # noqa: E402

# Headline set: the flagship + the widest shuffles/joins + one per operator
# family that matters at scale. Names must exist in the registry.
HEADLINE = [
    "advanced_query_dsl",
    "join_5way_agg",
    "groupby_agg",
    "weighted_branch_merge",
    "topk_global",
    "topk_per_group",
    "window_running_sum",
    "explode_tokens",
    "events_tumbling_window",
    "asof_nearest_ge",
    "count_distinct",
    "ragged_csv_roundtrip",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_clusters",
    "knn_bruteforce",
    "knn_lsh_bucketed",
    "knn_lsh_multiprobe",
    "knn_ivf",
    "knn_quantized",
    "text_quality_score",
    "text_fingerprint",
    "multimodal_decode_meta",
    "cube_agg",
    "approx_count_distinct_sketch",  # sketch-only; the oracled exact+sketch
    # contract query stays out of the headline list (it times both aggs)
    "table_profile",
    "events_funnel",
    "stratified_sample",
    "advanced_query_negation",
    "advanced_query_or_bounds",
    "csv_scan_join",
    "geojson_scan",
    "geometry_planes",
    "stream_stateful_profile",
    "stream_stream_join",
    "stream_dedup_events",
    "window_range_frame",
    "percentile_agg",
    "events_sessionize",
    "range_join_events",
    "ntile_buckets",
    "merge_upsert",
    "jsonl_scan",
    "grouping_sets_agg",
    "vocab_topk",
    "embedding_random_projection",
    "text_pii_scrub",
    "text_repetition_stats",
    "stream_static_join",
    "tfidf_search",
    "decontaminate_ngram",
    "weighted_sample",
    "pack_sequences",
    "source_mix_sample",
    "orc_scan",
    "stream_upsert_table",
    "curation_pipeline",
    "chunk_documents",
    "value_histogram",
    "fk_integrity_check",
    "scd2_build",
    "timeline_gapfill",
    "events_locf",
    "rank_distribution",
    "decontaminate_bloom",
    "value_drift_trend",
    "csv_gzip_scan",
    "multimodal_audio_chunks",
    "stream_incremental_rollup",
    "stream_partitioned_land",
    "stream_upsert_mor",
    "delete_where_rewrite",
    "manifest_skip_scan",
    "snapshot_diff",
    "zorder_key",
    "bucket_by_cutpoints",
    "sql_api_pricing_summary",
    "cohort_retention",
    "compact_small_files",
    "session_funnel",
    "lm_unigram_score",
    "anomaly_mad",
    "salted_skew_join",
    "multimodal_decode_pixels",
    "multimodal_wav_decode",
    # round 6: table-format proofs, geometry partial oracle, and the new
    # training-data / join / streaming operators
    "geometry_planes_checksum",
    "rowgroup_skip_scan",
    "schema_evolution_read",
    "null_skip_scan",
    "table_changes_feed",
    "partition_evolution_read",
    "epoch_shuffle",
    "quality_upsample",
    "dedup_keep_best",
    "bloom_join_prefilter",
    "stream_source_quota",
    "dedup_index_lakehouse",
    "agg_pushdown_scan",
    "delete_tombstone_mor",
    "bloom_skip_scan",
    "cdc_incremental_agg",
    "bpe_pair_counts",
    "bpe_encode_topk",
    "lm_bigram_score",
    "dedup_substring_runs",
    "knn_index_lakehouse",
    "multimodal_resize_downsample",
    "multimodal_audio_energy",
    "stream_cdc_rollup",
    "manifest_count_scan",
    "constrained_land",
    "clone_evolve_read",
    "text_novelty_score",
    "text_winnow_fingerprints",
    # round 7/8: the streaming table source and the r8 quartet
    # (VERDICT r08 #2 — first time benched)
    "stream_table_source",
    "bpe_encode_learned",
    "lm_bigram_assoc",
    "doc_dedup_cross_shard",
    "commit_rebase_stats",  # CONTRACT query — timed, gated out (below)
    # round 9: INSERT OVERWRITE / replaceWhere round trip, the
    # streaming partition-refresh over it, and DSIR importance
    # resampling
    "overwrite_partition_transaction",
    "stream_overwrite_refresh",
    "dsir_select",
    "table_changes_typed",
    "hybrid_search_rrf",
    "split_leakage_free",
    # r10: conditional multi-clause MERGE INTO; compressed PNG decode;
    # typed CDF streaming source; Z-order clustered compaction
    "merge_into_conditional",
    "multimodal_decode_png",
    "stream_table_changes_typed",
    "zorder_clustered_scan",
    "cdc_apply_typed",
    "merge_schema_evolution",
    "stream_merge_conditional",
    # r11: composite-key merge-delete over tuple deletion vectors;
    # baseline-sequential JPEG decode (pure NumPy)
    "merge_delete_composite",
    "multimodal_decode_jpeg",
    # r11: standalone UPDATE ... SET ... WHERE (the DML triad)
    "update_where_partition",
    # r12: predicate DELETE with the CDC delete-image sidecar
    "delete_where_cdc",
    # r12: column mapping — rename/drop then the mapped two-generation read
    "rename_column_read",
    # r12: codec-variant corpus (palette/16-bit/Adam7 PNG, RLE/565/32
    # BMP, progressive JPEG) decoded end-to-end
    "multimodal_decode_variants",
    # r12: perceptual-hash image dedup over really-decoded PNGs
    "dedup_image_ahash",
    # r12: real video — MJPEG AVI container + per-frame JPEG decode
    "multimodal_video_frames",
    # r12: 2:1 PCM resample over decoded WAV
    "multimodal_audio_resample",
    # r12: product-quantized ANN with ADC + exact rescore
    "knn_pq_adc",
    # r12: real GIF decode (LZW, interlace, animation)
    "multimodal_decode_gif",
    # r12: TIFF decode (IFD walk, none/LZW+predictor/PackBits)
    "multimodal_decode_tiff",
    # r13: MERGE INTO through column mapping (typed-feed image rollup)
    "merge_mapped_cdc",
    # r13: the typed commitlog stream over a column-mapped table
    "stream_mapped_changes",
    # r13: IVF-PQ composition (probed lists x ADC codes + exact rescore)
    "knn_ivfpq",
    # r13: GIF animation compositing (sub-rect deltas + transparency)
    "multimodal_decode_gif_anim",
    # r13: the materialized IVF-PQ index (partition-pruned probes)
    "knn_ivfpq_lakehouse",
    # r13: SemDeDup — semantic-cluster-scoped near-dup pruning
    "dedup_semdedup",
    # r13: streaming first-writer-wins simhash-band admission
    "stream_neardup_admission",
    # r13: tfidf answered from the incrementally-MERGEd inverted index
    "tfidf_index_incremental",
    # r13: catalog-level atomic multi-table publish (protocol proof)
    "catalog_atomic_publish",
    # r13: the inverted index maintained by a streaming foreachBatch writer
    "stream_index_maintenance",
    # r14: catalog time travel — a past publish's multi-table vector
    "catalog_time_travel",
    # r14: BM25 ranking, inline scan form
    "bm25_search",
    # r14: BM25 served from the streaming-maintained inverted index
    "bm25_index_stream",
    # r14: streaming semantic (SemDeDup) admission
    "stream_semdedup_admission",
    # r15: writable catalog branches + atomic staging->main promotion
    "catalog_branches",
    # r15: IVF-PQ index maintained by a streaming foreachBatch writer
    "knn_ivfpq_index_stream",
    # approx_percentile_bound stays out: like the oracled HLL contract
    # query, it times exact+sketch together (the sketch-only timing is
    # representative via percentile_agg's plan shape)
]


# Oracle-CONTRACT queries (VERDICT r04 #5): these deliberately compute an
# exact answer ALONGSIDE the approximate/structural one so the DuckDB
# oracle can hash-pin an error bound or partition contract — the production
# plan at 100 TB runs the cheap half alone (each docstring says which).
# Their timings therefore move when the CONTRACT changes, not the engine;
# bench_results.json lists them in a separate section and
# tools/bench_compare.py keeps them out of the 2x regression gate.
CONTRACT_QUERIES = {
    "approx_count_distinct_sketch",  # exact + sketch (5%-error pin)
    "hll_shard_merge",               # exact + merged-sketch pin
    "salted_skew_join",              # salted + plain join parity pin
    "stream_windowed_distinct",      # exact distinct + windowed HLL pin
    "commit_rebase_stats",           # 9-commit 8-thread write-race proof:
    # its wall time tracks the transaction CONTRACT (serialized CAS
    # ledger + rebase re-manifests), not a query plan
    "catalog_atomic_publish",        # 6-commit 2-publish crash-proof:
    # wall time tracks the multi-table commit protocol, not a plan
    "catalog_time_travel",           # 6-commit 2-publish + AS OF resolve:
    # wall time tracks the same commit protocol, not a plan
    "catalog_branches",              # branch + 2 publishes + promotion:
    # wall time tracks the ref/commit protocol, not a plan
}


def _sf_number(sf: str):
    # "0.0.1".replace(".","").isdigit() is True but float() raises —
    # try the conversion instead of guessing at validity
    try:
        return float(sf)
    except ValueError:
        return sf


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as mod

    qs = mod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("bench_only_")
    ]

    spark = get_spark("bench")
    # Warm the JVM + parquet footer caches outside the timed region.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            _run(qs[name](spark, sf_dir))  # warm-up: codegen + workers
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _run(qs[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            # one broken query must not discard an hour of collected
            # timings — record it and keep the partial run writable
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        # Some operators cache/localCheckpoint internally (dedup clusters,
        # stream replay); dropping those blocks between queries keeps one
        # query's residue from inflating the next 40 measurements
        # (measured: +4x on late-listed queries over a 46-query run).
        spark.catalog.clearCache()
        gc.collect()  # release py4j refs so ContextCleaner frees RDD blocks

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # Disclosed subset whose timing tracks an oracle CONTRACT rather
        # than engine throughput (see CONTRACT_QUERIES above) — excluded
        # from bench_compare's regression gate.
        "contract_queries": sorted(CONTRACT_QUERIES & set(timings)),
        "sf": _sf_number(sf),
    }
    if errors:
        result["errors"] = errors
    line = json.dumps(result)
    # The driver records only a bounded stdout tail, which clipped the
    # first ~7 per-query timings in r03 (BENCH_r03.json parsed:null) —
    # persist the full dict to a repo file so round-over-round comparison
    # never depends on capture-window length.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results.json"),
        "w",
    ) as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
