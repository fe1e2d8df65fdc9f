"""Streaming sinks: exactly-once parquet landing with checkpoint resume,
and a foreachBatch MERGE sink into a versioned keyed table.

The memory sink in events.py exists for the synchronous oracle contract;
this is the production shape — readStream → parquet writeStream with a
checkpoint directory. The checkpoint's WAL records which source files each
micro-batch committed, so a restarted query resumes AFTER the last
committed batch: already-processed input is never re-emitted (end-to-end
exactly-once for a replayable source + transactional file sink).
tests/test_streaming_sink.py pins that: stop mid-stream, restart, and the
landed rows equal the batch read exactly — no duplicates, no gaps.

The upsert sink is the other half of the lakehouse write path: append-only
landing keeps every version of a key, while `upsert_stream_to_table`
maintains LATEST-per-key state by merging each micro-batch into a keyed
table. Without a table format in the container (Delta/Iceberg), the commit
protocol is explicit and minimal — exactly what those formats do under the
hood: each batch writes a NEW immutable version directory, then an
atomic pointer swap (`os.replace`) publishes it together with the batch id
that produced it; a replayed batch (restart between write and checkpoint
commit) sees its id already published and becomes a no-op, so the
merge is idempotent end-to-end. Readers resolve the pointer once and only
ever see a fully-written version.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_POINTER = "_CURRENT"


def land_stream_to_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start (or resume, if the checkpoint exists) landing a stream to
    parquet. ``availableNow`` processes everything currently available in
    bounded micro-batches then stops — the batch-backfill trigger; pass
    False for a continuously running query."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_pointer(table_dir: str) -> dict:
    try:
        with open(os.path.join(table_dir, _POINTER)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"version": 0, "batch_ids": []}


def _publish(table_dir: str, version: int, batch_ids: list[int]) -> None:
    """Atomic pointer swap: readers see the old version or the new one,
    never a half-written directory."""
    fd, tmp = tempfile.mkstemp(dir=table_dir)
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "batch_ids": batch_ids}, f)
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def read_keyed_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Resolve the current version pointer and read that directory, or
    None before the first publish."""
    ptr = _read_pointer(table_dir)
    if ptr["version"] == 0:
        return None
    return spark.read.parquet(os.path.join(table_dir, f"v{ptr['version']}"))


def merge_into(
    base: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keyed merge — union + ROW_NUMBER, ONE shuffle on the merge key (the
    join-based MERGE shape takes two). Updates must already be unique per
    key. With order_col=None this is SCD-1 (updates win uncondition-
    ally — correct when the feed is in arrival order). With an order_col,
    the row with the GREATEST order value wins (update wins ties): a
    micro-batch feed is NOT globally time-ordered — a later batch can
    carry an older event for a key, and blind prefer-update would roll
    newer state back. `tiebreak` columns (greatest wins) resolve equal
    order values deterministically; without them the update wins ties."""
    if base is None:
        return updates
    order = [F.col(order_col).desc()] if order_col else []
    order += [F.col(c).desc() for c in tiebreak or []]
    w = Window.partitionBy(*keys).orderBy(*order, "_src")
    return (
        updates.withColumn("_src", F.lit(0))
        .unionByName(base.withColumn("_src", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def upsert_stream_to_table(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain a latest-per-key parquet table from a stream via
    foreachBatch MERGE. Within each micro-batch the newest row per key
    (max order_col, then greatest `tiebreak` columns — pass one to make
    equal-order rows deterministic) is
    reduced first, then merged over the current table version; the result
    lands as an immutable v{N+1} directory published by an atomic pointer
    swap recording the batch id — replayed batches no-op, so restart
    between write and checkpoint commit cannot double-apply.

    Scale shape: the per-batch reduce and the merge share the key
    partitioning (one shuffle each on `keys`); the rewrite cost is the
    TABLE size per batch — the plain-parquet trade-off a real table format
    removes with file-level merge-on-read/copy-on-write, which is the swap
    you'd make in production. State lives in the table, not the
    state store, so the stream itself is stateless and unbounded keys are
    fine."""
    os.makedirs(table_dir, exist_ok=True)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        ptr = _read_pointer(table_dir)
        if batch_id in ptr["batch_ids"]:
            return  # replayed micro-batch: already published, no-op
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak or []]
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged = merge_into(
            read_keyed_table(spark, table_dir), latest, keys, order_col, tiebreak
        )
        version = ptr["version"] + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(table_dir, f"v{version}")
        )
        _publish(table_dir, version, ptr["batch_ids"] + [batch_id])

    writer = df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_stream_to_table(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain an ADDITIVE aggregate table (counts + sums per key) from a
    stream via foreachBatch — the incremental-materialized-view pattern:
    each micro-batch is reduced to per-key partials, then ADDED into the
    current table version (union + one hash re-aggregation — additive
    merges need no row precedence, unlike the upsert sink's argmax).

    Idempotence matters MORE here than for upserts: re-applying an upsert
    batch is naturally a no-op, but re-ADDING a batch double-counts — the
    published batch-id list (same atomic-pointer protocol as
    upsert_stream_to_table) is what makes restart-between-write-and-
    checkpoint-commit safe.

    Scale shape: the per-batch partial is a map-side-combined shuffle
    whose width is the KEY CARDINALITY, not the batch row count; the
    merge re-aggregates table ∪ partials on the same keys. Table size is
    bounded by key cardinality, so the per-batch rewrite stays small even
    when the stream is unbounded — this is why hourly-rollup tables are
    maintainable where raw-event tables need a real table format."""
    os.makedirs(table_dir, exist_ok=True)

    def _rollup_batch(batch_df: DataFrame, batch_id: int) -> None:
        ptr = _read_pointer(table_dir)
        if batch_id in ptr["batch_ids"]:
            return  # replayed micro-batch: additions already published
        spark = batch_df.sparkSession
        aggs = [F.count(F.lit(1)).cast("long").alias(count_col)] + [
            F.sum(c).alias(out) for c, out in sum_cols.items()
        ]
        partial = batch_df.groupBy(*keys).agg(*aggs)
        base = read_keyed_table(spark, table_dir)
        if base is not None:
            merged = (
                base.unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum(count_col).cast("long").alias(count_col),
                    *[F.sum(out).alias(out) for out in sum_cols.values()],
                )
            )
        else:
            merged = partial
        version = ptr["version"] + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(table_dir, f"v{version}")
        )
        _publish(table_dir, version, ptr["batch_ids"] + [batch_id])

    writer = df.writeStream.foreachBatch(_rollup_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
