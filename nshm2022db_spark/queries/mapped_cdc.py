"""Shared contract for the mapped-merge CDC pair (r13): the oracle SQL
and 4-commit history builder `merge_mapped_cdc` (queries/pipeline.py,
batch typed feed) and `stream_mapped_changes` (streaming/events.py, the
changeTypes commitlog stream) both use — sharing ONE oracle makes
stream-equals-batch value-pinned by the correctness gate itself. Leaf
module on purpose: it must not import the registry (both consumers are
imported BY the registry, and a decoration-time cross-import between
them would be circular)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Every aggregate is an integer
# checksum (FLOOR per row before summing) — order-independent and
# bit-exact across engines (oracle discipline).
MAPPED_MERGE_CDC_ORACLE = """WITH e AS (
           SELECT event_id, user_id, value, event_type FROM events)
       SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS commit_version,
                  'insert' AS change_type, COUNT(*) AS n,
                  CAST(SUM(event_id) AS BIGINT) AS id_sum,
                  CAST(SUM(user_id) AS BIGINT) AS uid_sum,
                  CAST(SUM(FLOOR(value)) AS BIGINT) AS fscore_sum
           FROM e
           -- v2/v3 are metadata-only RENAME commits: no images
           UNION ALL
           SELECT CAST(4 AS BIGINT), 'update_preimage', COUNT(*),
                  CAST(SUM(event_id) AS BIGINT),
                  CAST(SUM(user_id) AS BIGINT),
                  CAST(SUM(FLOOR(value)) AS BIGINT)
           FROM e WHERE event_id % 7 = 0
           UNION ALL
           SELECT CAST(4 AS BIGINT), 'update_postimage', COUNT(*),
                  CAST(SUM(event_id) AS BIGINT),
                  CAST(SUM(user_id) AS BIGINT),
                  CAST(SUM(FLOOR(value * 2)) AS BIGINT)
           FROM e WHERE event_id % 7 = 0
           UNION ALL
           SELECT CAST(4 AS BIGINT), 'delete', COUNT(*),
                  CAST(SUM(event_id) AS BIGINT),
                  CAST(SUM(user_id) AS BIGINT),
                  CAST(SUM(FLOOR(value)) AS BIGINT)
           FROM e WHERE event_id % 13 = 0 AND event_id % 7 <> 0
           UNION ALL
           SELECT CAST(4 AS BIGINT), 'insert', COUNT(*),
                  CAST(SUM(event_id + 2000000) AS BIGINT),
                  CAST(SUM(event_id % 97) AS BIGINT),
                  CAST(SUM(FLOOR(value) * 4) AS BIGINT)
           FROM e WHERE event_id % 17 = 0
       ) WHERE n > 0"""


def _mapped_merge_history(spark: SparkSession, ev: DataFrame, path: str):
    """The 4-commit mapped-merge history merge_mapped_cdc and
    stream_mapped_changes share: land events by type, TWO metadata-only
    renames (value->score, user_id->uid), then one conditional MERGE
    in the NEW logical names whose CDC sidecar records exact images
    under the stable physical names."""
    from nshm2022db_spark.streaming.sinks import (
        append_partition_transaction,
        merge_into_table,
        rename_column,
    )

    append_partition_transaction(
        spark, path, "event_type", ev, stats_cols=["event_id"]
    )
    rename_column(spark, path, "value", "score")
    rename_column(spark, path, "user_id", "uid")
    upd = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", F.lit("upd").alias("tag"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("long").alias("uid"),
        F.lit(None).cast("string").alias("event_type"),
    )
    dele = ev.filter(
        (F.col("event_id") % 13 == 0) & (F.col("event_id") % 7 != 0)
    ).select(
        "event_id", F.lit("del").alias("tag"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("long").alias("uid"),
        F.lit(None).cast("string").alias("event_type"),
    )
    ins = ev.filter(F.col("event_id") % 17 == 0).select(
        (F.col("event_id") + 2000000).alias("event_id"),
        F.lit("ins").alias("tag"),
        (F.floor("value") * F.lit(4.0)).alias("score"),
        (F.col("event_id") % 97).cast("long").alias("uid"),
        "event_type",
    )
    merge_into_table(
        spark, path, upd.unionByName(dele).unionByName(ins),
        ["event_id"],
        when_matched=[
            ("update", "s.tag = 'upd'", {"score": "t.score * 2"}),
            ("delete", "s.tag = 'del'"),
        ],
        when_not_matched_insert={
            "event_id": "s.event_id", "score": "s.score",
            "uid": "s.uid", "event_type": "s.event_type",
        },
        stats_cols=["event_id"],
    )




def mapped_cdc_rollup(feed: DataFrame) -> DataFrame:
    """The per-(commit, change_type) integer-checksum rollup BOTH
    consumers must apply identically — the stream-equals-batch pin is
    only meaningful if the aggregates cannot drift apart (r13 review
    #4). Per-row FLOOR before the sum keeps every aggregate an
    order-independent integer, bit-exact cross-engine."""
    return feed.groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("id_sum"),
        F.sum("uid").cast("long").alias("uid_sum"),
        F.sum(F.floor("score")).cast("long").alias("fscore_sum"),
    )
