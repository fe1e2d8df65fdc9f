"""Behavioral tests for the temporal warehouse family (queries/temporal.py)
and the bloom decontamination screen (extensions/curation.py).

The DuckDB oracle gate proves value equality; these pin the semantic
invariants that survive refactors: SCD2 interval contiguity, gap-fill
density, LOCF carry correctness, rank bounds, and the bloom screen's
no-false-negative guarantee vs the exact join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nshm2022db_spark.extensions.curation import (
    decontaminate_bloom,
    decontaminate_ngram,
)
from nshm2022db_spark.functions.timecols import epoch_us
from nshm2022db_spark.queries.temporal import (
    events_locf,
    rank_distribution,
    scd2_build,
    timeline_gapfill,
)
from nshm2022db_spark.sources import read_table


class TestScd2:
    def test_intervals_contiguous_and_versions_dense(self, spark, sf_dir):
        """Per user: valid_to of version k equals valid_from of version
        k+1 (no gaps, no overlaps), versions are dense from 1, and
        exactly one open (is_current) interval exists."""
        dim = scd2_build(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("version")
        chained = dim.withColumn("next_from", F.lead("valid_from").over(w))
        broken = chained.filter(
            F.col("next_from").isNotNull()
            & (F.col("valid_to") != F.col("next_from"))
        ).count()
        assert broken == 0
        open_counts = (
            dim.groupBy("user_id")
            .agg(F.sum(F.col("is_current").cast("long")).alias("n_open"))
            .filter(F.col("n_open") != 1)
            .count()
        )
        assert open_counts == 0
        bad_versions = (
            dim.withColumn("rn", F.row_number().over(w))
            .filter(F.col("version") != F.col("rn"))
            .count()
        )
        assert bad_versions == 0

    def test_no_consecutive_duplicate_states(self, spark, sf_dir):
        dim = scd2_build(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("version")
        dups = (
            dim.withColumn("prev_state", F.lag("event_type").over(w))
            .filter(F.col("event_type") == F.col("prev_state"))
            .count()
        )
        assert dups == 0


class TestGapfill:
    def test_dense_span_and_count_conservation(self, spark, sf_dir):
        filled = timeline_gapfill(spark, sf_dir)
        ev_n = read_table(spark, sf_dir, "events").count()
        total = filled.agg(F.sum("n")).collect()[0][0]
        assert total == ev_n
        # Row count per user == full hour span (dense, gaps included).
        spans = filled.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("rows"),
            (
                (F.max(epoch_us("bucket_start")) - F.min(epoch_us("bucket_start")))
                / 3_600_000_000
                + 1
            ).alias("span_hours"),
        )
        assert spans.filter(F.col("rows") != F.col("span_hours")).count() == 0


class TestLocf:
    def test_carry_matches_recomputation(self, spark, sf_dir):
        out = events_locf(spark, sf_dir)
        # Purchase rows carry their own value.
        # events_locf drops `value`; re-join it for the check.
        ev = read_table(spark, sf_dir, "events").select("event_id", "value")
        joined = out.join(ev, "event_id")
        bad_self = joined.filter(
            (F.col("event_type") == "purchase")
            & (F.col("last_purchase_value") != F.col("value"))
        ).count()
        assert bad_self == 0
        # Rows before a user's first purchase carry NULL.
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        first_purchase = (
            read_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min("ts").alias("first_p_ts"))
        )
        pre = out.join(first_purchase, "user_id", "left").filter(
            F.col("first_p_ts").isNull() | (F.col("ts") < F.col("first_p_ts"))
        )
        assert pre.filter(F.col("last_purchase_value").isNotNull()).count() == 0


class TestRankDistribution:
    def test_bounds_and_extremes(self, spark, sf_dir):
        r = rank_distribution(spark, sf_dir)
        assert r.filter((F.col("pr") < 0) | (F.col("pr") > 1)).count() == 0
        assert r.filter((F.col("cd") <= 0) | (F.col("cd") > 1)).count() == 0
        # Each priority class tops out at cume_dist exactly 1.
        tops = r.groupBy("o_orderpriority").agg(F.max("cd").alias("m"))
        assert tops.filter(F.col("m") != 1.0).count() == 0


class TestBloomScreen:
    def test_no_false_negatives_vs_exact(self, spark, sf_dir):
        """Every document the exact join flags as contaminated must be
        flagged by the bloom screen (superset property); bloom-clean
        implies exact-clean."""
        bloom = decontaminate_bloom(spark, sf_dir).select(
            "doc_id", F.col("n_candidates").alias("nb"), F.col("clean").alias("cb")
        )
        exact = decontaminate_ngram(spark, sf_dir).select(
            "doc_id", F.col("n_contaminated").alias("ne"), F.col("clean").alias("ce")
        )
        j = bloom.join(exact, "doc_id")
        assert j.count() > 0
        # candidate count >= true overlap count, per document
        assert j.filter(F.col("nb") < F.col("ne")).count() == 0
        # bloom clean => exact clean
        assert j.filter(F.col("cb") & ~F.col("ce")).count() == 0


class TestDriftTrend:
    def test_matches_numpy_ols(self, spark, sf_dir):
        """Integer-sum OLS == numpy lstsq per group (sf0.001 is small
        enough to recompute driver-side)."""
        import numpy as np

        from nshm2022db_spark.queries.temporal import value_drift_trend

        got = {
            r["event_type"]: (r["slope_cents_per_hour"], r["intercept_cents"])
            for r in value_drift_trend(spark, sf_dir).collect()
        }
        ev = read_table(spark, sf_dir, "events").select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("b"),
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("y"),
        )
        rows = ev.collect()
        by_type: dict = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append((r["b"], r["y"]))
        for et, pts in by_type.items():
            bs = np.array([p[0] for p in pts], dtype=np.float64)
            xs = bs - bs.min()
            ys = np.array([p[1] for p in pts], dtype=np.float64)
            slope, intercept = np.polyfit(xs, ys, 1)
            assert abs(got[et][0] - slope) < 1e-4, et
            assert abs(got[et][1] - intercept) < 1e-2, et


class TestCsvGzip:
    def test_round_trip_and_gzip_files(self, spark, sf_dir, tmp_path):
        import glob
        import os

        from nshm2022db_spark.queries.pipeline import csv_gzip_scan
        from nshm2022db_spark.sources.scratch import scratch_path

        out = csv_gzip_scan(spark, sf_dir)
        base = (
            read_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
        )
        got = {r["lang"]: (r["n_docs"], r["total_chars"]) for r in out.collect()}
        want = {r["lang"]: (r["n_docs"], r["total_chars"]) for r in base.collect()}
        assert got == want
        # The land step must produce gzip members (the non-splittable
        # caveat the docstring documents is only real if they ARE .gz).
        land = os.path.join(scratch_path("docs_csv_gz", sf_dir), "docs")
        assert glob.glob(os.path.join(land, "*.csv.gz")), os.listdir(land)


class TestAudioChunks:
    def test_chunks_cover_payload_contiguously(self, spark, sf_dir):
        from nshm2022db_spark.extensions.multimodal import (
            SAMPLE_RATE,
            multimodal_audio_chunks,
        )

        chunks = multimodal_audio_chunks(spark, sf_dir)
        n_samples = (
            read_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 1)
            .select(
                F.col("doc_id").alias("media_id"),
                F.expr("octet_length(encode(text, 'utf-8')) div 2").alias("ns"),
            )
        )
        per_media = chunks.groupBy("media_id").agg(
            F.max("end_sample").alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("start_sample").alias("first_start"),
        )
        j = per_media.join(n_samples, "media_id")
        assert j.count() > 0
        # Full coverage from sample 0; every clip gets >= 1 chunk even
        # when shorter than the window.
        assert j.filter(F.col("first_start") != 0).count() == 0
        assert j.filter(
            F.col("covered") != F.greatest(F.col("ns"), F.lit(0))
        ).count() == 0
        # Chunk k starts exactly at k * window (tumbling contiguity).
        bad = chunks.filter(
            F.col("start_sample") != F.col("chunk_idx") * SAMPLE_RATE
        ).count()
        assert bad == 0
