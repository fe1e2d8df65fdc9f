"""Stream-stream interval join (north-star streaming scope; absent in the
reference, SURVEY §2.10).

view→click attribution: each click joins the SAME user's views in the
preceding 30 minutes. Both sides carry watermarks so the state store can
evict: a view older than (click watermark − 30 min) can never match again
and is dropped — this is the standard bounded-state interval join, and at
scale the state size is (views per user per 30 min) × active users,
independent of stream length.

Single-batch file replay makes the result equal the batch self-join, which
is the registered DuckDB oracle (time arithmetic in the join condition —
a range join, exercised through the streaming engine)."""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.registry import register
# Module-object import, attributes resolved at CALL time: a user who
# imports streaming.events directly starts events → registry →
# (registry's bottom imports) → this module while events is still
# partially initialized; binding its names at import time would raise.
from nshm2022db_spark.streaming import events as _events

_counter = itertools.count()


def view_click_attribution(events: DataFrame) -> DataFrame:
    """events stream → (user_id, view_ts, click_ts) pairs where the click
    follows the view by (0, 30] minutes."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("v_user").alias("user_id"),
        _events.ntz("view_ts").alias("view_ts"),
        _events.ntz("click_ts").alias("click_ts"),
    )


@register(
    "stream_stream_join",
    """SELECT v.user_id, v.ts AS view_ts, c.ts AS click_ts
       FROM events v JOIN events c
         ON c.user_id = v.user_id
        AND c.event_type = 'click' AND v.event_type = 'view'
        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE""",
)
def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream interval join through a real streaming
    job; the oracle is the equivalent batch range self-join."""
    events = _events._event_stream(spark, sf)
    out = view_click_attribution(events)
    return _events._run_to_memory(out, f"stream_join_{next(_counter)}", output_mode="append")
