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
