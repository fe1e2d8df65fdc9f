"""Multi-batch accumulation test for the applyInPandasWithState operator —
the behavior a single-batch oracle can't see: state must carry across
micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from nshm2022db_spark.sources import read_table
from nshm2022db_spark.streaming.stateful import (
    user_profile_stream,
    _run_update_to_memory,
)


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """The same events table written as 4 parquet files, so
    maxFilesPerTrigger=1 replays it in 4 micro-batches."""
    out = str(tmp_path_factory.mktemp("events_split"))
    (
        read_table(spark, sf_dir, "events")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_state_accumulates_across_batches(spark, sf_dir, split_events_dir):
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, "
            "props string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
        .withWatermark("ts", "1 hour")
    )
    updates = _run_update_to_memory(
        user_profile_stream(stream), "stateful_multibatch"
    )
    # >1 micro-batch ⇒ active users get multiple update rows.
    assert updates.count() > updates.select("user_id").distinct().count()

    # Final state per user = the row with the largest cumulative n.
    final = (
        updates.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n").desc())
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )

    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.countDistinct("event_type").cast("int").alias("n_types"),
        )
    )
    got = {r.user_id: r for r in final.collect()}
    want = {r.user_id: r for r in batch.collect()}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert (g.n, g.n_types) == (w.n, w.n_types)
        assert abs(g.total - w.total) < 0.02
        assert g.first_ts == w.first_ts and g.last_ts == w.last_ts


class TestWatermarkLateData:
    def test_late_events_beyond_watermark_are_dropped(self, spark, tmp_path):
        """Append-mode windowed aggregation finalizes a window at the end
        of the first batch whose watermark passed it, and DROPS events
        for that window arriving in LATER batches — the eviction that
        bounds state at scale. Three micro-batches: batch 1 advances the
        watermark past the 09:00 window; batch 2 lets the engine emit
        and evict it; batch 3 replays an event into the evicted window —
        it must neither re-open the window nor emit a duplicate row."""
        import os
        import time as _time

        from pyspark.sql import functions as F

        def _events(rows):
            return spark.createDataFrame(
                rows, "event_id long, ts_s string, value double"
            ).select(
                "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
            )

        base = "2024-06-01 "
        src = str(tmp_path / "src")
        os.makedirs(src)
        batches = [
            [(1, base + "09:00:10", 1.0), (2, base + "09:30:00", 1.0),
             (3, base + "12:00:05", 1.0)],
            [(4, base + "12:05:00", 1.0)],
            [(5, base + "09:00:20", 1.0),   # evicted window → dropped
             (6, base + "12:10:00", 1.0)],  # open window → kept (unemitted)
        ]
        now = _time.time()
        for i, rows in enumerate(batches):
            d = os.path.join(src, f"f{i}")
            _events(rows).coalesce(1).write.parquet(d)
            # file source orders micro-batches by mtime; pin it
            for root, _dirs, files in os.walk(d):
                for f in files:
                    os.utime(os.path.join(root, f), (now - 60 + i, now - 60 + i))

        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("late_data_test")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM late_data_test").collect()
        spark.catalog.dropTempView("late_data_test")
        nine = [r.n for r in rows if r.ws.hour == 9]
        # Exactly ONE emission of the 09:00 window, WITHOUT the late
        # event (n=2, not 3) and without a duplicate row from batch 3.
        assert nine == [2], rows
        # The 12:00 window never closed (watermark 11:10) — not emitted.
        assert not [r for r in rows if r.ws.hour == 12], rows


def test_quota_admission_invariant_to_batch_split(
    spark, sf_dir, split_events_dir
):
    """The admitted set must be identical however the stream is split
    into micro-batches: final per-(source, day) counters from a 4-batch
    replay equal the batch window/rank answer."""
    from nshm2022db_spark.streaming.stateful import (
        QUOTA_PER_WINDOW,
        source_quota_stream,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, "
            "props string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    updates = _run_update_to_memory(
        source_quota_stream(stream), "quota_multibatch"
    )
    # final state per window = the update with the largest n_seen
    final = (
        updates.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type", "win").orderBy(
                    F.col("n_seen").desc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )

    ranked = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("win"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "win").orderBy("event_id")
    batch = (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n_seen", F.count(F.lit(1)).over(
            Window.partitionBy("event_type", "win")
        ))
        .filter(F.col("rn") <= QUOTA_PER_WINDOW)
        .groupBy("event_type", "win")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.count(F.lit(1)).alias("n_admitted"),
            F.sum("event_id").alias("admitted_sum"),
        )
    )
    got = {(r.event_type, r.win): (r.n_seen, r.n_admitted, r.admitted_sum)
           for r in final.collect()}
    want = {(r.event_type, r.win): (r.n_seen, r.n_admitted, r.admitted_sum)
            for r in batch.collect()}
    assert got == want
    # the quota genuinely binds somewhere in this corpus
    assert any(seen > adm for seen, adm, _ in want.values())
