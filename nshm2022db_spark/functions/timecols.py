"""Timestamp column helpers shared by the events-table queries.

The canonical events ts type is TIMESTAMP_NTZ (sources/parquet.py
normalize_events_ts), but epoch extraction (`unix_micros`) is only
defined on TIMESTAMP. The helper routes NTZ through an LTZ cast, which
is exact because the session zone is pinned to UTC by
ensure_nanos_as_long — the same pin that makes the NTZ normalization
itself exact. DuckDB twin: ``epoch_us(ts)`` on a naive timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_us_sql(col: str) -> str:
    """SQL-string twin of epoch_us, for F.expr compositions."""
    return f"unix_micros(cast({col} as timestamp))"
