"""The events-ts layout contract (sources/parquet.py): batch reads
normalize to TIMESTAMP_NTZ and streaming readers sniff the footer —
for BOTH physical layouts, the current micros files and the nanos-int64
layout earlier testdata generations used. The nanos branch would
otherwise be dead code until a regeneration silently flips it back.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nshm2022db_spark.sources.parquet import events_ts_type, read_table

US = [1717200000_000_000 + i * 30_000_000 for i in range(6)]  # micros


def _write_events(tmp_path, unit):
    factor = 1000 if unit == "ns" else 1
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array([u * factor for u in US], pa.timestamp(unit)),
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "event_type": pa.array(["view"] * 6),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
        }
    )
    d = str(tmp_path / f"layout_{unit}")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("unit,expected", [("us", "micros"), ("ns", "nanos")])
def test_footer_sniff(spark, tmp_path, unit, expected):
    d = _write_events(tmp_path, unit)
    assert events_ts_type(d) == expected


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_batch_read_normalizes_to_ntz(spark, tmp_path, unit):
    d = _write_events(tmp_path, unit)
    df = read_table(spark, d, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    got = sorted(r.us for r in df.select(F.expr(
        "unix_micros(cast(ts as timestamp))").alias("us")).collect())
    assert got == US  # exact micros round-trip, either layout


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_streaming_read_both_layouts(spark, tmp_path, unit):
    from nshm2022db_spark.streaming.events import _raw_event_stream

    d = _write_events(tmp_path, unit)
    stream = _raw_event_stream(spark, d, d)
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    # The stream (and its memory-sink temp view) live on the dedicated
    # replay session, not the caller's — query the view THERE.
    replay = stream.sparkSession
    assert replay is not spark
    q = (
        stream.select("event_id", "ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(f"layout_{unit}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r.us
        for r in replay.sql(
            f"SELECT unix_micros(ts) AS us FROM layout_{unit}"
        ).collect()
    )
    replay.catalog.dropTempView(f"layout_{unit}")
    assert got == US


def test_replay_session_isolates_conf(spark):
    """The 8-partition state-store conf lives on the cached replay child
    session; the caller's session-global conf is never touched (VERDICT
    r03 'What's wrong' #2)."""
    from nshm2022db_spark.streaming.events import _replay_session

    before = spark.conf.get("spark.sql.shuffle.partitions")
    replay = _replay_session(spark)
    assert replay is not spark
    assert _replay_session(spark) is replay  # cached
    assert _replay_session(replay) is replay  # idempotent
    assert replay.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_dir_sniff_prefers_streamed_files(spark, tmp_path):
    """_dir_ts_type reads the layout from the directory the stream
    actually consumes, not the static table (ADVICE r03): a nanos static
    table with a micros-rewritten stream dir must yield micros."""
    from nshm2022db_spark.streaming.events import _dir_ts_type

    static = _write_events(tmp_path, "ns")  # static events.parquet: nanos
    src = tmp_path / "landed"
    os.makedirs(src)
    pq.write_table(pq.read_table(os.path.join(static, "events.parquet")).cast(
        pa.schema([
            pa.field("event_id", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ])
    ), str(src / "part-0.parquet"))
    assert _dir_ts_type(str(src), static) == "micros"
    assert _dir_ts_type(str(tmp_path / "empty"), static) == "nanos"  # fallback
