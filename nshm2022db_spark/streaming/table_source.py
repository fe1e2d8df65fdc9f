"""Structured Streaming SOURCE over the commit-log table — readStream
on a lakehouse table, the Delta "streaming from a table / change data
feed" surface (VERDICT r06 next-round #3).

`read_table_changes` (sinks.py) gives a BATCH incremental read: "the
rows commits (from, to] added". This module lifts that exact contract
into a Spark 4 Python Data Source (`pyspark.sql.datasource
.DataSourceStreamReader`), so a silver job is simply

    spark.readStream.format("commitlog").option("path", bronze).load()

instead of the bespoke foreachBatch coupling `stream_cdc_rollup` uses —
the medallion story's missing half. The streaming OFFSET is the commit
VERSION (the `maintain_incremental_agg` cursor generalized): Spark's
checkpoint persists `{"version": N}`, a restarted query resumes after
the last committed micro-batch, and each emitted row carries its
`_commit_version` so downstream folds stay attributable.

Scale shape: offsets and partition PLANNING are metadata-only driver
work over the commit log (O(tail) manifests, never data); the DATA read
fans out one `InputPartition` per (commit, partition entry) so executors
read generation files in parallel, Arrow-batched end to end (planner
hands pyarrow RecordBatches straight to Spark — no per-row Python). On
a real cluster the commit log lives on shared storage exactly as every
other reader in sinks.py assumes. Admission control via
`maxVersionsPerBatch` bounds a micro-batch to N commits, so a source
that fell far behind catches up in bounded-memory steps instead of one
giant batch (Delta's maxFilesPerTrigger analog).

Soundness contract mirrors `maintain_incremental_agg` (sinks.py): the
stream is only additive over APPEND-ONLY history — a rewrite, delete,
restore, or clone in the unread range RAISES rather than silently
double-counting (each manifest carries its `op` tag); metadata-only
commits (set-constraints, partition evolution's empty stage) emit
nothing; a commit vacuumed before it was read also raises.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "commitlog"

# ops an additive streaming read can express; everything else raises
# (same allow-list as maintain_incremental_agg — evolve and
# set-constraints are metadata-only for the ADD-rows feed)
_ADDITIVE_OPS = ("append", "set-constraints", "evolve")


def _plan_changes(table_dir: str, start: int, end: int) -> list[dict]:
    """Driver-side plan of the add-rows feed for versions (start, end]:
    one dict per (commit, partition entry) with the entry's immutable
    file list. Metadata-only commits plan nothing; a RESTORE (or any
    other non-additive op) in the range always RAISES — unlike
    `read_table_changes`'s snapshot diff, a version-cursor stream
    cannot re-attribute republished rows without double-counting.
    Never touches Spark — this is the metadata half,
    `CommitLogStreamReader.read` is the data half."""
    from nshm2022db_spark.streaming.sinks import table_history

    out: list[dict] = []
    hist = table_history(table_dir)
    have = {m["version"] for m in hist}
    for v in range(start + 1, end + 1):
        if v not in have:
            raise ValueError(
                f"commit {v} of {table_dir} was vacuumed before the "
                "stream read it; keep retention above the max consumer "
                "lag or restart the stream from the current version"
            )
    for m in hist:
        v = m["version"]
        if v <= start or v > end:
            continue
        if "partitions" not in m or "mor" in m:
            raise ValueError(
                f"{table_dir} is not an append-only partition-mapped "
                "table; the commitlog stream source reads those only"
            )
        op = m.get("op")
        if op not in _ADDITIVE_OPS:
            raise ValueError(
                f"commit {v} of {table_dir} is {op!r} — a streaming "
                "read is only sound over append-only history "
                "(rewrites/deletes/restores would double-count or "
                "silently drop state); recompute downstream instead"
            )
        stage = m["dir"]
        prefix = f"{m['partition_col']}="
        stage_abs = os.path.join(table_dir, stage)
        entries = (
            sorted(n for n in os.listdir(stage_abs) if n.startswith(prefix))
            if os.path.isdir(stage_abs)
            else []
        )
        for e in entries:
            d = os.path.join(stage_abs, e)
            files = sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
            if not files:
                continue
            out.append(
                {
                    "version": v,
                    "pcol": m["partition_col"],
                    "value": e.split("=", 1)[1],
                    "files": files,
                }
            )
    return out


def table_stream_schema(table_dir: str) -> StructType:
    """The stream's schema: the union of every live generation's parquet
    schema (schema evolution — later generations may add columns; older
    ones read those as NULL) + the partition column (string, the
    module-wide normalization) + `_commit_version` (long). Footer-only
    metadata work, no Spark jobs."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from nshm2022db_spark.streaming.sinks import (
        _entry_dirs,
        current_commit,
    )

    cur = current_commit(table_dir)
    if cur["version"] == 0 or "partitions" not in cur:
        raise ValueError(
            f"{table_dir} is not a committed partition-mapped table"
        )
    pcol = cur["partition_col"]
    merged = None
    seen: set[str] = set()
    for entry, dirs in sorted(cur["partitions"].items()):
        for dirname in _entry_dirs(dirs):
            d = os.path.join(table_dir, dirname, entry)
            key = os.path.normpath(d)
            if key in seen or not os.path.isdir(d):
                continue
            seen.add(key)
            files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            if not files:
                continue
            s = pq.read_schema(os.path.join(d, files[0]))
            if merged is None:
                merged = s
            else:
                for f in s:
                    if f.name not in merged.names:
                        merged = merged.append(f)
    if merged is None:
        raise ValueError(f"{table_dir} holds no data files to infer from")
    # Force every data field NULLABLE — RECURSIVELY: Spark writes
    # REQUIRED parquet fields for non-nullable DataFrame columns, but
    # under schema evolution a column added by a later commit must
    # surface as NULL for rows from earlier generations — a required
    # field there makes the JVM reject the Arrow batch outright. A
    # top-level-only rewrite would leave an evolution-added STRUCT
    # column's children required and hit the same rejection when
    # old-generation files fill it with null children (r9 review).
    import pyarrow as pa

    def _force_nullable(t: pa.DataType) -> pa.DataType:
        if pa.types.is_struct(t):
            return pa.struct(
                [
                    pa.field(
                        f.name, _force_nullable(f.type),
                        nullable=True, metadata=f.metadata,
                    )
                    for f in t
                ]
            )
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            mk = pa.large_list if pa.types.is_large_list(t) else pa.list_
            return mk(
                pa.field(
                    t.value_field.name, _force_nullable(t.value_type),
                    nullable=True, metadata=t.value_field.metadata,
                )
            )
        if pa.types.is_map(t):
            # map KEYS stay non-nullable (parquet/Arrow invariant)
            return pa.map_(t.key_type, _force_nullable(t.item_type))
        return t

    merged = pa.schema(
        [
            pa.field(
                f.name, _force_nullable(f.type),
                nullable=True, metadata=f.metadata,
            )
            for f in merged
        ],
        metadata=merged.metadata,
    )
    # prefer_timestamp_ntz: tz-naive parquet timestamps surface as
    # TIMESTAMP_NTZ, matching what read_keyed_table's batch scan of the
    # same files yields (a stream consumer needing watermarking casts to
    # TIMESTAMP explicitly, the events.py discipline)
    spark_schema = from_arrow_schema(merged, prefer_timestamp_ntz=True)
    spark_schema = spark_schema.add(pcol, "string").add(
        "_commit_version", "long"
    )
    return spark_schema


class CommitLogPartition(InputPartition):
    """One (commit, partition entry) unit of parallel read work. Files
    are immutable once committed, so capturing paths at plan time is
    race-free by construction."""

    def __init__(self, files: list[str], pcol: str, value: str, version: int):
        self.files = files
        self.pcol = pcol
        self.value = value
        self.version = version


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("commitlog source requires .option('path', dir)")
        self._schema = schema
        self._start = int(options.get("startingversion", 0))
        self._max_versions = int(options.get("maxversionsperbatch", 0))
        # admission-control floor: the newest offset THIS process has
        # planned or committed. Spark 4.1.2's call order (probed, both
        # paths): FRESH start = latestOffset() BEFORE initialOffset(),
        # so the floor must start at `startingversion`; RESTART = a
        # partitions(committed, committed) replay of the checkpointed
        # range BEFORE the first latestOffset(), which raises the floor
        # to the checkpoint — latestOffset can therefore never fall
        # below the committed offset (no backwards batches) and the
        # catch-up after a lagging restart stays bounded too.
        self._floor: int = self._start
        # defensive fallback (ADVICE r08): the floor hard-depends on the
        # restart replay above. On a runtime WITHOUT it, a clamped offset
        # at-or-below the checkpoint would stall the stream forever
        # (Spark never fetches below its committed offset, and neither
        # partitions() nor commit() would ever fire to raise the floor).
        # Track whether any partitions()/commit() has been observed; until
        # then, each REPEATED clamped latestOffset probe steps the floor
        # by one admission quantum — advertising a larger end can never
        # lose data (Spark supplies the batch's start), so catch-up stays
        # bounded yet always terminates. The fallback additionally
        # DISARMS the moment initialOffset() is called: initialOffset
        # only fires on a checkpoint-less FRESH start, where a stall is
        # impossible (Spark's committed offset starts at our own initial
        # offset, strictly below any clamped advertisement) — so a
        # runtime that probes latestOffset more than once per trigger
        # can never widen a fresh start's first batch (r9 review). Only
        # the no-replay-restart signature (repeated clamped probes with
        # NO initialOffset/partitions/commit ever seen) arms stepping.
        self._observed = False
        self._fresh_start = False
        self._stall_probes = 0

    # -- offset protocol (driver) ---------------------------------------
    def initialOffset(self) -> dict:
        # only called on a checkpoint-less fresh start — a stall below
        # the (nonexistent) checkpoint is impossible, disarm the probe
        self._fresh_start = True
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from nshm2022db_spark.streaming.sinks import current_commit

        head = current_commit(self._path)["version"]
        if self._max_versions > 0:
            # bound each micro-batch to N commits so a lagging consumer
            # catches up in bounded-memory steps (Delta's
            # maxFilesPerTrigger analog, keyed on commits)
            bound = self._floor + self._max_versions
            if head > bound and not self._observed and not self._fresh_start:
                # stall-probe fallback (see __init__): a second clamped
                # advertisement with still no partitions()/commit() means
                # the runtime never constructed a batch from the first —
                # its checkpointed offset sits above our floor. Step up.
                self._stall_probes += 1
                if self._stall_probes >= 2:
                    self._floor = bound
                    bound = self._floor + self._max_versions
            head = min(head, bound)
        return {"version": max(head, self._floor)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._observed = True
        self._floor = max(self._floor, end["version"])
        plan = _plan_changes(self._path, start["version"], end["version"])
        return [
            CommitLogPartition(p["files"], p["pcol"], p["value"], p["version"])
            for p in plan
        ]

    # -- data read (executors) ------------------------------------------
    def read(self, partition: CommitLogPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        for path in partition.files:
            t = pq.read_table(path)
            n = t.num_rows
            cols = []
            for field in target:
                if field.name == partition.pcol:
                    arr = pa.array([partition.value] * n, type=field.type)
                elif field.name == "_commit_version":
                    arr = pa.array([partition.version] * n, type=field.type)
                elif field.name in t.column_names:
                    arr = t.column(field.name).cast(field.type)
                else:  # schema evolution: column added by a later commit
                    arr = pa.nulls(n, type=field.type)
                cols.append(arr)
            out = pa.table(cols, schema=target)
            yield from out.to_batches()

    def commit(self, end: dict) -> None:
        # progress durably lives in Spark's checkpoint; remember it only
        # as this process's admission-control floor
        self._observed = True
        self._floor = max(self._floor, end["version"])


class CommitLogDataSource(DataSource):
    """`spark.readStream.format("commitlog").option("path", d).load()` —
    register once per session via `register_commitlog_source`."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return table_stream_schema(self.options["path"])

    def streamReader(self, schema: StructType) -> CommitLogStreamReader:
        return CommitLogStreamReader(schema, dict(self.options))


def register_commitlog_source(spark: SparkSession) -> None:
    """Idempotent per-session registration (re-register replaces)."""
    spark.dataSource.register(CommitLogDataSource)
