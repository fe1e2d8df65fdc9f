"""Custom stateful streaming operator: per-user activity profile.

API choice note: Spark 4's `transformWithStateInPandas` (typed
ValueState/ListState/MapState + timers) is the designated successor to
`applyInPandasWithState`; its Python driver worker requires a working
`google.protobuf` install, which this runtime lacks (verified: the
state-server handshake crashes on protobuf import, and installs are not
permitted here). The operator therefore uses `applyInPandasWithState`,
which shares the same keyed-state execution model (state partitioned by
key across executors, Arrow-batched), so swapping to the new API on a
standard cluster is a mechanical port of `_update_profile`.

The reference has no streaming surface (SURVEY §2.10); this is part of the
north-star extension scope. The operator keeps arbitrary per-key state the
built-in windowed aggregates can't express — a running profile per user
(event count, value total, first/last seen, distinct event-type set held
IN state) — via ``applyInPandasWithState``: Arrow-batched, one state row
per key in the state store, emitting an updated profile row every
micro-batch the key appears in.

At scale this is the canonical keyed-state pattern: state is partitioned
by the grouping key across executors, each micro-batch shuffles only that
batch's rows to their key's partition, and idle-key expiry would hang off
the event-time watermark (NoTimeout here — the profile is cumulative by
design).

Correctness contract: on a single-batch file replay the final profile per
user equals the batch GROUP BY — that is the registered DuckDB oracle.
Multi-batch accumulation (the part a batch query can't see) is pinned by
tests/test_stateful_stream.py, which replays the same events split across
four files with maxFilesPerTrigger=1 and asserts the final state matches
the batch answer.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nshm2022db_spark.functions.timecols import epoch_us
from nshm2022db_spark.registry import register
from nshm2022db_spark.streaming import events as _events  # module ref: see joins.py

_counter = itertools.count()

PROFILE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
        T.StructField("first_ts", T.TimestampNTZType(), False),
        T.StructField("last_ts", T.TimestampNTZType(), False),
        T.StructField("n_types", T.IntegerType(), False),
    ]
)

# State: counters + first/last micros + the distinct-type set, serialized
# as a sorted comma-join (the event-type alphabet is small and closed).
PROFILE_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("min_us", T.LongType()),
        T.StructField("max_us", T.LongType()),
        T.StructField("types", T.StringType()),
    ]
)


def _update_profile(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, min_us, max_us, types = (
        state.get if state.exists else (0, 0.0, None, None, "")
    )
    seen = set(types.split(",")) - {""}
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
        min_us = lo if min_us is None else min(min_us, lo)
        max_us = hi if max_us is None else max(max_us, hi)
        seen.update(pdf["event_type"].unique().tolist())
    state.update((n, total, min_us, max_us, ",".join(sorted(seen))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "total": [round(total, 2)],
            "first_ts": [pd.to_datetime(min_us, unit="us")],
            "last_ts": [pd.to_datetime(max_us, unit="us")],
            "n_types": [len(seen)],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user cumulative profile updates (one row per
    (user, micro-batch) in update mode)."""
    with_us = events.withColumn("ts_us", epoch_us("ts"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        PROFILE_OUTPUT,
        PROFILE_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _run_update_to_memory(updates: DataFrame, name: str) -> DataFrame:
    # The replay-session scoping and caller-session materialization live
    # in events._run_to_memory; update mode is the only difference here.
    return _events._run_to_memory(updates, name, output_mode="update")


@register(
    "stream_stateful_profile",
    """SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS total,
              MIN(ts) AS first_ts, MAX(ts) AS last_ts,
              COUNT(DISTINCT event_type) AS n_types
       FROM events GROUP BY user_id""",
)
def stream_stateful_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Custom keyed-state operator over the events stream; single-batch
    replay makes the final state equal the batch GROUP BY (the oracle)."""
    updates = user_profile_stream(_events._event_stream(spark, sf))
    return _run_update_to_memory(updates, f"stream_stateful_{next(_counter)}")


# ---------------------------------------------------------------------------
# Per-source admission control (rate limiting / quota enforcement)
# ---------------------------------------------------------------------------

QUOTA_PER_WINDOW = 5  # admitted events per (source, event-time day)

QUOTA_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("win", T.TimestampNTZType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("n_admitted", T.LongType(), False),
        T.StructField("admitted_sum", T.LongType(), False),
    ]
)

# State per source: JSON {win_us: [n_seen, [admitted ids...]]} — the
# admitted list is BOUNDED at QUOTA_PER_WINDOW entries, so state size is
# O(open windows × quota) regardless of traffic.
QUOTA_STATE = T.StructType([T.StructField("js", T.StringType())])


def _update_quota(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json as _json

    wins = _json.loads(state.get[0]) if state.exists else {}
    touched = set()
    for pdf in pdfs:
        for win_us, grp in pdf.groupby("win_us"):
            k = str(int(win_us))
            seen, adm = wins.get(k, [0, []])
            seen += len(grp)
            # keep the Q smallest ids seen so far: deterministic — the
            # final admitted set is independent of micro-batch splits
            adm = sorted(set(adm) | set(grp["event_id"].tolist()))[
                :QUOTA_PER_WINDOW
            ]
            wins[k] = [seen, adm]
            touched.add(k)
    state.update((_json.dumps(wins),))
    rows = [
        {
            "event_type": key[0],
            "win": pd.to_datetime(int(k), unit="us"),
            "n_seen": wins[k][0],
            "n_admitted": len(wins[k][1]),
            "admitted_sum": sum(wins[k][1]),
        }
        for k in sorted(touched)
    ]
    yield pd.DataFrame(rows, columns=[f.name for f in QUOTA_OUTPUT.fields])


def source_quota_stream(events: DataFrame) -> DataFrame:
    """events stream → per-(source, day) admission updates: at most
    QUOTA_PER_WINDOW events admitted per window, deterministically the
    smallest event_ids, with the seen/admitted counts emitted every
    micro-batch a window is touched."""
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "win_us", epoch_us(F.date_trunc("day", F.col("ts")))
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _update_quota,
        QUOTA_OUTPUT,
        QUOTA_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_source_quota",
    f"""WITH ranked AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS win, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                  ORDER BY event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type, date_trunc('day', ts))
                   AS n_seen
        FROM events)
    SELECT event_type, win,
           CAST(MAX(n_seen) AS BIGINT) AS n_seen,
           COUNT(*) AS n_admitted,
           CAST(SUM(event_id) AS BIGINT) AS admitted_sum
    FROM ranked
    WHERE rn <= {QUOTA_PER_WINDOW}
    GROUP BY event_type, win""",
)
def stream_source_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming admission control — the ingestion-side rate limiter a
    shared 100 TB landing zone runs: each source gets a fixed quota per
    event-time window, enforced in keyed state (bounded at quota × open
    windows per source), with the admitted set chosen DETERMINISTICALLY
    (smallest event_ids) so the final admission decision is independent
    of micro-batch boundaries — replays and backfills admit identical
    rows. Single-batch replay makes the final per-window counters equal
    the batch window/rank query (the oracle); the batch-split invariance
    is pinned by tests/test_stateful_stream.py."""
    updates = source_quota_stream(_events._event_stream(spark, sf))
    return _run_update_to_memory(updates, f"stream_quota_{next(_counter)}")
