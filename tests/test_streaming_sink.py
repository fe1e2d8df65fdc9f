"""Checkpoint-resume test for the parquet streaming sink: interrupt after
the first micro-batch, restart from the same checkpoint, and the landed
output must equal the batch read exactly — no duplicates, no gaps."""

from __future__ import annotations

import pyspark.sql.functions as F

from nshm2022db_spark.sources import read_table
from nshm2022db_spark.streaming.sinks import land_stream_to_parquet


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = read_table(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, value double,"
                " props string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # First run: stop after the first committed micro-batch (1 file of 4).
    q = land_stream_to_parquet(stream(), out, ckpt, trigger_available_now=False)
    while not q.recentProgress:
        q.awaitTermination(0.2)
    q.stop()
    q.awaitTermination()

    landed_partial = spark.read.parquet(out).count()
    assert 0 < landed_partial  # something committed before the stop

    # Restart from the same checkpoint: availableNow drains the rest.
    q2 = land_stream_to_parquet(stream(), out, ckpt, trigger_available_now=True)
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == events.count()  # no gaps, no duplicates
    assert got.select(F.sum("event_id")).collect()[0][0] == (
        events.select(F.sum("event_id")).collect()[0][0]
    )


class TestUpsertSink:
    def _stream(self, spark, src):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, value double,"
                " props string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def test_latest_per_key_matches_batch(self, spark, sf_dir, tmp_path):
        """Drain the events stream into a keyed table; the table must hold
        exactly the batch-computed latest event per user."""
        from nshm2022db_spark.streaming.sinks import (
            read_keyed_table,
            upsert_stream_to_table,
        )

        src = str(tmp_path / "src")
        events = read_table(spark, sf_dir, "events")
        events.repartition(4).write.parquet(src)

        q = upsert_stream_to_table(
            self._stream(spark, src).select("user_id", "event_id", "ts"),
            str(tmp_path / "table"),
            str(tmp_path / "ckpt"),
            keys=["user_id"],
            order_col="ts",
            tiebreak=["event_id"],
        )
        q.awaitTermination()

        got = {
            r.user_id: r.event_id
            for r in read_keyed_table(spark, str(tmp_path / "table")).collect()
        }
        from pyspark.sql import Window

        # With the event_id tiebreak the sink is fully deterministic:
        # the table must equal the batch argmax(ts, event_id) per user.
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = events.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        expected = {r.user_id: r.event_id for r in latest.collect()}
        assert got == expected

    def test_replayed_batch_is_noop(self, spark, sf_dir, tmp_path):
        """Re-applying an already-published batch id must not bump the
        version — the idempotence the checkpoint-replay path relies on."""
        from nshm2022db_spark.streaming.sinks import (
            _read_pointer,
            upsert_stream_to_table,
        )

        src = str(tmp_path / "src")
        events = read_table(spark, sf_dir, "events")
        events.coalesce(1).write.parquet(src)
        table = str(tmp_path / "table")

        q = upsert_stream_to_table(
            self._stream(spark, src).select("user_id", "event_id", "ts"),
            table,
            str(tmp_path / "ckpt"),
            keys=["user_id"],
            order_col="ts",
        )
        q.awaitTermination()
        ptr = _read_pointer(table)

        # Fresh checkpoint replays batch 0 against the same table dir.
        q2 = upsert_stream_to_table(
            self._stream(spark, src).select("user_id", "event_id", "ts"),
            table,
            str(tmp_path / "ckpt2"),
            keys=["user_id"],
            order_col="ts",
        )
        q2.awaitTermination()
        assert _read_pointer(table) == ptr


class TestRollupSink:
    def _stream(self, spark, src):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, value double,"
                " props string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def test_additive_rollup_matches_batch(self, spark, sf_dir, tmp_path):
        """Drain events split over 4 micro-batches; the maintained table
        must equal the one-shot batch rollup (counts exact, sums close)."""
        from nshm2022db_spark.streaming.sinks import (
            read_keyed_table,
            rollup_stream_to_table,
        )

        src = str(tmp_path / "src")
        events = read_table(spark, sf_dir, "events")
        events.repartition(4).write.parquet(src)

        q = rollup_stream_to_table(
            self._stream(spark, src).select("event_type", "value"),
            str(tmp_path / "table"),
            str(tmp_path / "ckpt"),
            keys=["event_type"],
            sum_cols={"value": "total"},
        )
        q.awaitTermination()

        got = {
            r.event_type: (r.n, r.total)
            for r in read_keyed_table(spark, str(tmp_path / "table")).collect()
        }
        want = {
            r.event_type: (r.n, r.total)
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], k
            assert abs(got[k][1] - want[k][1]) < 1e-6, k

    def test_replayed_batch_does_not_double_count(self, spark, sf_dir, tmp_path):
        """Re-draining the same source with a FRESH checkpoint replays
        batch 0 against the same table; the published batch-id list must
        make the re-add a no-op (re-adding would double every count)."""
        from nshm2022db_spark.streaming.sinks import (
            _read_pointer,
            rollup_stream_to_table,
        )

        src = str(tmp_path / "src")
        events = read_table(spark, sf_dir, "events")
        events.coalesce(1).write.parquet(src)
        table = str(tmp_path / "table")

        def drain(ckpt):
            q = rollup_stream_to_table(
                self._stream(spark, src).select("event_type", "value"),
                table,
                str(tmp_path / ckpt),
                keys=["event_type"],
                sum_cols={"value": "total"},
            )
            q.awaitTermination()

        drain("ckpt")
        ptr = _read_pointer(table)
        drain("ckpt2")  # fresh checkpoint → replays batch 0
        assert _read_pointer(table) == ptr


class TestErasureRewrite:
    def test_untouched_partitions_byte_identical(self, spark, sf_dir, tmp_path):
        """The erasure rewrite must replace ONLY the DELETE_TYPES
        partitions; every other partition's files stay byte-identical
        (same names, sizes, mtimes) — that file preservation IS the
        scale claim (delete cost ∝ affected partitions)."""
        import os

        from nshm2022db_spark.queries.pipeline import (
            DELETE_TYPES,
            DELETE_USER_MOD,
            apply_erasure_rewrite,
        )

        path = str(tmp_path / "events_by_type")
        ev = read_table(spark, sf_dir, "events")
        ev.write.partitionBy("event_type").parquet(path)

        def snapshot(part):
            d = os.path.join(path, f"event_type={part}")
            return {
                f: (os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
                for f in sorted(os.listdir(d))
                if not f.startswith(".")
            }

        untouched = [
            p.split("=", 1)[1]
            for p in os.listdir(path)
            if p.startswith("event_type=") and p.split("=", 1)[1] not in DELETE_TYPES
        ]
        assert untouched, "fixture needs at least one untouched partition"
        before = {p: snapshot(p) for p in untouched}

        apply_erasure_rewrite(spark, path)

        for p in untouched:
            assert snapshot(p) == before[p], p
        # And the affected partitions really lost the erasure set.
        table = spark.read.parquet(path)
        leaked = table.filter(
            F.col("event_type").isin(*DELETE_TYPES)
            & (F.col("user_id") % DELETE_USER_MOD == 0)
        ).count()
        assert leaked == 0
        kept = table.filter(~F.col("event_type").isin(*DELETE_TYPES)).count()
        assert kept == ev.filter(~F.col("event_type").isin(*DELETE_TYPES)).count()
