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
