"""Query registry: every implemented operator as a (Spark callable, DuckDB
oracle SQL) pair, keyed by a stable name.

This is the single source __spark_entry__.py exposes to the driver, and the
local harness (tools/verify_local.py) runs the same pairs. Numbers track
SURVEY.md §2 operator ids in the docstrings.

Float discipline: every aggregate that sums doubles is rounded (ROUND(x, 4))
on BOTH sides — partial-aggregation order differs between engines, and the
driver hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.plans.advanced_query import (
    AdvancedQueryTables,
    OracleNames,
    advanced_query,
    advanced_query_oracle_sql,
)
from nshm2022db_spark.sources import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable, optionally
    with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: the membership-DSL advanced query (SURVEY §3.1; J7+A2+A3+A5+O3)
# ---------------------------------------------------------------------------

FLAGSHIP_DSL = "Brand#1 & !(Brand#2 | Brand#3)"
_FLAGSHIP_KW = dict(rate_bounds=(1000.0, None), limit=100, fault_count_limit=4)


def _star_tables(spark: SparkSession, sf_dir: str) -> AdvancedQueryTables:
    """orders ← lineitem → part plays rupture ← rupture_faults → fault
    (FIXTURES.md §B role mapping)."""
    return AdvancedQueryTables(
        fact=read_table(spark, sf_dir, "orders"),
        bridge=read_table(spark, sf_dir, "lineitem"),
        dim=read_table(spark, sf_dir, "part"),
        fact_key="o_orderkey",
        bridge_fact_key="l_orderkey",
        bridge_dim_key="l_partkey",
        dim_key="p_partkey",
        name_col="p_brand",
        rate_col="o_totalprice",
    )


_FLAGSHIP_ORACLE_NAMES = OracleNames(
    fact="orders",
    bridge="lineitem",
    dim="part",
    fact_key="o_orderkey",
    bridge_fact_key="l_orderkey",
    bridge_dim_key="l_partkey",
    dim_key="p_partkey",
    name_col="p_brand",
    rate_col="o_totalprice",
    fact_cols=(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
)


@register(
    "advanced_query_dsl",
    advanced_query_oracle_sql(_FLAGSHIP_ORACLE_NAMES, FLAGSHIP_DSL, **_FLAGSHIP_KW),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL `Brand#1 & !(Brand#2 | Brand#3)`: orders whose lineitems include
    Brand#1 parts but no Brand#2/#3, ≤4 distinct brands, totalprice ≥ 1000,
    top-100 by totalprice (reference semantics: query.py:318-333)."""
    return advanced_query(_star_tables(spark, sf_dir), FLAGSHIP_DSL, **_FLAGSHIP_KW)


# Two more DSL shapes through the same pipeline+oracle generator: pure
# negation with a zero lower bound (the reference silently DROPS 0 bounds
# via truthiness, query.py:298-314 — honoring them is a documented
# deviation the oracle now pins), and an OR-chain with a magnitude-style
# second bound column.

_NEG_DSL = "!Brand#2 & !Brand#3"
_NEG_KW = dict(rate_bounds=(0.0, 50_000.0), limit=100)


@register(
    "advanced_query_negation",
    advanced_query_oracle_sql(_FLAGSHIP_ORACLE_NAMES, _NEG_DSL, **_NEG_KW),
)
def advanced_query_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL `!Brand#2 & !Brand#3` with a 0.0 lower rate bound."""
    return advanced_query(_star_tables(spark, sf_dir), _NEG_DSL, **_NEG_KW)


_OR_DSL = "Brand#4 | (Brand#5 & !Brand#1)"
_OR_KW = dict(magnitude_bounds=(None, 30000.0), limit=50, fault_count_limit=3)


def _star_tables_mag(spark: SparkSession, sf_dir: str) -> AdvancedQueryTables:
    t = _star_tables(spark, sf_dir)
    t.magnitude_col = "o_totalprice"
    return t


import dataclasses as _dc  # noqa: E402

_OR_ORACLE_NAMES = _dc.replace(_FLAGSHIP_ORACLE_NAMES, magnitude_col="o_totalprice")


@register(
    "advanced_query_or_bounds",
    advanced_query_oracle_sql(_OR_ORACLE_NAMES, _OR_DSL, **_OR_KW),
)
def advanced_query_or_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL OR-chain with compound NOT, an upper magnitude-style bound, and
    a distinct-name cap."""
    return advanced_query(_star_tables_mag(spark, sf_dir), _OR_DSL, **_OR_KW)


# Populate the registry: importing each family module runs its @register
# decorators. Bottom import is deliberate (modules import `register` back
# from here).
from nshm2022db_spark.queries import geometry, pipeline, relational, temporal  # noqa: E402,F401
from nshm2022db_spark.extensions import curation, dedup, multimodal, similarity, text  # noqa: E402,F401
from nshm2022db_spark.streaming import catalog, events, joins, stateful  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-facing ordering. The driver gate verifies exactly the FIRST 50
# registered queries (observed r01-r03). The standing contract (pinned by
# tests/test_extensions.py::TestDriverOrder, ADVICE r03 wording):
#   * every query that is NEW this round, or whose OWN expressions changed
#     since its last green CORRECTNESS row, sits inside the window;
#   * a change to a SHARED primitive keeps at least one in-window
#     representative per changed code path (the full set is re-proven by
#     the local 3-scale verify gates, which run every query);
#   * remaining slots refresh the stalest tail rows; queries with
#     established green rows and untouched code rotate to the tail.
# ---------------------------------------------------------------------------

_DRIVER_ORDER = [
    # ROUND-13 WINDOW (VERDICT r12 next-round #1/#2/#6 + stretch #7 +
    # the standing tail contract):
    # (a) NEW in r13: MERGE INTO through column mapping + the typed
    #     commitlog stream over a mapped table (one shared oracle, so
    #     stream-equals-batch is value-pinned by the gate itself), the
    #     IVF-PQ composition — inline AND materialized (the lakehouse
    #     form shares the oracle: where bytes live must not change the
    #     answer) — and SemDeDup (cluster-scoped semantic dedup with
    #     fixed-occupancy clustering);
    # (b) shared primitives changed in r13, one in-window
    #     representative each: merge_into_table (logical decision
    #     frame, physical staging/sidecar/dv, evolve-joins-map,
    #     re-insert consolidation through the map) ->
    #     merge_into_conditional / merge_delete_composite /
    #     merge_schema_evolution / stream_merge_conditional /
    #     merge_upsert; _enforce_constraints (logical projection, all
    #     five write paths) -> constrained_land + update_where_partition
    #     + delete_where_cdc + overwrite_partition_transaction +
    #     compact_small_files; set_table_constraints (guard lifted) ->
    #     constrained_land; the commitlog stream planner/reader/schema
    #     (map capture + projection + materialize guard) ->
    #     stream_table_source (untyped) + stream_table_changes_typed
    #     (typed); _check_mappable (dv keys compared through the map)
    #     -> rename_column_read;
    # (c) tail refresh per the r12 tail-head contract: the EIGHT
    #     remaining r8-evidence rows first (geojson_scan .. 
    #     approx_percentile_bound), then the stalest r9 rows to the
    #     window boundary. After this window no driver evidence older
    #     than r9 remains; the r14 priority is the rest of the r9
    #     block (except_types .. window_running_sum at the tail head).
    # (a2) NEW in r13 late leg: GIF animation COMPOSITING
    #     (sub-rectangle deltas + transparency + disposal — the last
    #     native-GIF boundary erased), with one in-window
    #     representative per codec primitive the hardening sweep and
    #     the compositor touched: decode_gif/encode_gif ->
    #     multimodal_decode_gif; decode_jpeg (fill-byte marker walk)
    #     -> multimodal_decode_jpeg; decode_bmp (RLE pairing) ->
    #     multimodal_decode_pixels; decode_avi_mjpeg (cumulative
    #     budget) -> multimodal_video_frames. Displaced to the tail
    #     head (r14 priority): decontaminate_ngram, dedup_incremental,
    #     distinct_ordered, embedding_random_projection,
    #     events_sessionize, decontaminate_bloom, count_distinct.
    # (a3) NEW in r13 continuation leg: streaming first-writer-wins
    #     simhash-band admission (shares the order-free band-index
    #     oracle with the batch form), the incrementally-MERGEd
    #     inverted index (tfidf_search's oracle verbatim — maintaining
    #     the index must not move a score), and the catalog-level
    #     atomic multi-table publish (consistency booleans value-pinned
    #     in the gate). compact_small_files stays the in-window
    #     representative of the compaction primitive the index build
    #     parameterizes (the new stats_cols/bloom_cols OPTIMIZE
    #     overrides); dedup_simhash and tfidf_search share only
    #     UNCHANGED constants/expressions with the new queries, so they
    #     keep their fresh tail evidence.
    #     stream_index_maintenance is the streamed form of the index
    #     (per-micro-batch foreachBatch merges, exactly-once by
    #     batch_id), sharing tfidf_search's oracle. Displaced to the
    #     tail head (r14 priority, joining the seven r9 rows listed
    #     below): any_value_carry, asof_nearest_ge,
    #     asof_nearest_ge_per_key, conditional_agg_membership.
    "stream_neardup_admission",
    "tfidf_index_incremental",
    "stream_index_maintenance",
    "catalog_atomic_publish",
    "merge_mapped_cdc",
    "stream_mapped_changes",
    "knn_ivfpq",
    "knn_ivfpq_lakehouse",
    "dedup_semdedup",
    "multimodal_decode_gif_anim",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_decode_pixels",
    "multimodal_video_frames",
    "merge_into_conditional",
    "merge_delete_composite",
    "merge_schema_evolution",
    "stream_merge_conditional",
    "update_where_partition",
    "delete_where_cdc",
    "constrained_land",
    "rename_column_read",
    "stream_table_source",
    "stream_table_changes_typed",
    "overwrite_partition_transaction",
    "compact_small_files",
    "geojson_scan",
    "csv_scan_join",
    "ragged_csv_roundtrip",
    "join_5way_agg",
    "join_dim_hierarchy",
    "merge_upsert",
    "advanced_query_or_bounds",
    "approx_percentile_bound",
    "hybrid_search_rrf",
    "stream_overwrite_refresh",
    "dsir_select",
    "bpe_encode_learned",
    "lm_bigram_assoc",
    "doc_dedup_cross_shard",
    "stream_partitioned_land",
    "approx_count_distinct",
    "approx_count_distinct_sketch",
    "cube_agg",
    "grouping_sets_agg",
    "ntile_buckets",
    "percentile_agg",
    "rollup_agg",
    "advanced_query_dsl",
    "anti_join_missing",
    # --- 50-query window boundary (driver gate cap observed r01-r12) ---
    # Tail head - FIRST PRIORITY for the round-14 window: the four rows
    # the continuation leg displaced, the seven displaced r9 rows below
    # (count_distinct joined them for dedup_semdedup), then the
    # remaining r9 block.
    "any_value_carry",
    "asof_nearest_ge",
    "asof_nearest_ge_per_key",
    "conditional_agg_membership",
    "count_distinct",
    "decontaminate_bloom",
    "decontaminate_ngram",
    "dedup_incremental",
    "distinct_ordered",
    "embedding_random_projection",
    "events_sessionize",
    "multimodal_decode_variants",
    "multimodal_decode_png",
    "dedup_image_ahash",
    "multimodal_audio_resample",
    "knn_pq_adc",
    "multimodal_decode_tiff",
    "table_changes_typed",
    "cdc_apply_typed",
    "table_changes_feed",
    "delete_tombstone_mor",
    "bloom_skip_scan",
    "cdc_incremental_agg",
    "commit_rebase_stats",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "knn_bruteforce",
    "knn_lsh_bucketed",
    "knn_lsh_multiprobe",
    "knn_ivf",
    "text_lang_id",
    "text_quality_score",
    "text_token_stats",
    "text_pii_scrub",
    "text_fingerprint",
    "text_repetition_stats",
    "vocab_topk",
    "explode_tokens",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "stream_static_join",
    "stream_tumbling_window",
    "stream_stream_join",
    "stream_stateful_profile",
    "stratified_sample",
    "session_funnel",
    "anomaly_mad",
    "weighted_branch_merge",
    "advanced_query_negation",
    "except_types",
    "groupby_agg",
    "having_postagg",
    "intersect_types",
    "jsonl_scan",
    "knn_quantized",
    "left_join_count",
    "multimodal_wav_decode",
    "pivot_wide",
    "point_lookup",
    "range_filter",
    "range_join_events",
    "scalar_max",
    "stream_incremental_rollup",
    "split_leakage_free",
    "stream_upsert_table",
    "stream_upsert_mor",
    "stream_cdc_rollup",
    "tfidf_search",
    "scalar_string_format",
    "semi_join_membership",
    "scan_project",
    "stream_dedup_events",
    "stream_session_window",
    "stream_sliding_window",
    "stream_windowed_distinct",
    "surrogate_keys_dense",
    "table_profile",
    "topk_global",
    "topk_per_group",
    "union_all_stack",
    "unpivot_long",
    "value_histogram",
    "window_range_frame",
    "window_running_sum",
    "agg_pushdown_scan",
    "bloom_join_prefilter",
    "bpe_encode_topk",
    "bpe_pair_counts",
    "bucket_by_cutpoints",
    "chunk_documents",
    "clone_evolve_read",
    "cohort_retention",
    "curation_pipeline",
    "dedup_index_lakehouse",
    "dedup_keep_best",
    "dedup_substring_runs",
    "delete_where_rewrite",
    "epoch_shuffle",
    "events_locf",
    "zorder_clustered_scan",
    "rowgroup_skip_scan",
    "events_tumbling_window",
    "fk_integrity_check",
    "geometry_planes_checksum",
    "hll_shard_merge",
    "knn_index_lakehouse",
    "manifest_count_scan",
    "manifest_skip_scan",
    "multimodal_audio_energy",
    "multimodal_resize_downsample",
    "null_skip_scan",
    "partition_evolution_read",
    "quality_upsample",
    "rank_distribution",
    "salted_skew_join",
    "scd2_build",
    "schema_evolution_read",
    "snapshot_diff",
    "sql_api_pricing_summary",
    "stream_source_quota",
    "text_novelty_score",
    "text_winnow_fingerprints",
    "timeline_gapfill",
    "value_drift_trend",
    "lm_bigram_score",
    "lm_unigram_score",
    "csv_gzip_scan",
    "multimodal_audio_chunks",
    "json_extract",
    "events_funnel",
    "zorder_key",
    "weighted_sample",
    "pack_sequences",
    "source_mix_sample",
    "orc_scan",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "geometry_planes",
]


def ensure_driver_order() -> None:
    """Rebuild QUERIES/ORACLES in _DRIVER_ORDER (dicts preserve insertion
    order, which is what the driver iterates). Idempotent, and TOLERANT of
    names not yet registered: when a Spark python worker unpickles a
    pandas UDF it imports the UDF's defining module first, which circularly
    imports this module BEFORE that module's own @register calls have run —
    raising here would kill the worker; and the final registration order of
    a full import depends on which module a process touches first, so
    __spark_entry__.queries()/oracle_sql() re-apply this at call time.
    Unlisted registrations keep import order at the end."""
    ordered = {n: QUERIES[n] for n in _DRIVER_ORDER if n in QUERIES}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)


ensure_driver_order()
