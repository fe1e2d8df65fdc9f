"""Streaming sinks: exactly-once parquet landing with checkpoint resume.

The memory sink in events.py exists for the synchronous oracle contract;
this is the production shape — readStream → parquet writeStream with a
checkpoint directory. The checkpoint's WAL records which source files each
micro-batch committed, so a restarted query resumes AFTER the last
committed batch: already-processed input is never re-emitted (end-to-end
exactly-once for a replayable source + transactional file sink).
tests/test_streaming_sink.py pins that: stop mid-stream, restart, and the
landed rows equal the batch read exactly — no duplicates, no gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


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
