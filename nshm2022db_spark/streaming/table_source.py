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
plans one unit per (commit, partition entry) and byte-packs units into
executor tasks against a maxPartitionBytes target (r15 — a tiny batch
reads in one task, a real commit still fans out wide), Arrow-batched
end to end (the reader hands pyarrow RecordBatches straight to Spark —
no per-row Python). On
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

`.option("changeTypes", "true")` switches to the TYPED feed (r10,
VERDICT r09 #6): the streaming half of Delta CDF. Each micro-batch
emits the same images `read_table_changes_typed` computes for its
version range — a merge's CDC sidecar rows verbatim (update
pre/post-image pairs, deletes, inserts — r11, VERDICT r10 #1),
insert/delete pairs for non-keyed rewrites, added-generation inserts
for merge extensions, tombstone delete images semi-filtered to the
commit's added keys — plus `_change_type` and `_commit_timestamp`.
Overwrite/delete/merge commits are then first-class instead of
raising; stream-equals-batch is oracle-pinned by
`stream_table_changes_typed`. Rewrites tagged `data_change: false`
(compaction / Z-order) are provable restatements and plan NOTHING in
both modes — the untyped additive stream keeps flowing across table
maintenance instead of dying on it.
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

# per-worker memo of dv key-file reads (files are immutable; see read())
_KEYSET_CACHE: dict = {}

# ops an additive streaming read can express; everything else raises
# (same allow-list as maintain_incremental_agg — evolve and
# set-constraints are metadata-only for the ADD-rows feed)
_ADDITIVE_OPS = ("append", "set-constraints", "evolve")


def _materialize_versions(hist: list[dict]) -> list[int]:
    """Versions at which `materialize_column_mapping` re-based the
    table's PHYSICAL names — delegates the detection to sinks'
    `_is_materialize` so the batch feeds and the stream admission share
    ONE definition of a map re-base (r13 review #2)."""
    from nshm2022db_spark.streaming.sinks import _is_materialize

    by_v = {m["version"]: m for m in hist}
    return sorted(v for v, m in by_v.items() if _is_materialize(by_v, m))


def _check_stream_map(
    m: dict, map_meta: tuple, map_version: int, table_dir: str,
    mats: list[int],
) -> None:
    """Column-mapping admission for one planned commit (r13 — VERDICT
    r12 #2). A commit v serves correctly through the map the stream
    captured at start iff the PHYSICAL names it staged are the ones
    that map addresses:

    * v ≤ map_version AND no materialize re-based the physical names
      in (v, map_version] — rename/drop are metadata-only, so physical
      names are stable across them and one logical projection covers
      the whole span (the batch feeds' end-of-range rule, end = the
      captured head). A materialize between them means v's files carry
      pre-re-base names the captured map does not address — raise,
      even when the materialize commit itself falls outside this
      micro-batch's range (batch splitting must not hide it);
    * v > map_version with UNCHANGED map metadata. A change there is a
      schema change the stream's fixed schema cannot express — raise
      for a restart, Delta's streaming schema-change behavior (a
      post-start materialize always changes the metadata: it clears a
      non-empty map, so it is caught here too)."""
    v = m["version"]
    if v <= map_version:
        if any(v < mv <= map_version for mv in mats):
            raise ValueError(
                f"commit {v} of {table_dir} predates a column-mapping "
                "materialize (physical rename); its files cannot be "
                "served under the current schema — start the stream "
                "from the materialize version or later"
            )
        return
    from nshm2022db_spark.streaming.sinks import _map_meta

    if _map_meta(m) != map_meta:
        raise ValueError(
            f"commit {v} of {table_dir} changed the column mapping "
            "(RENAME/DROP COLUMN) after this stream started; a stream's "
            "schema is fixed at start — restart the stream to pick up "
            "the new logical schema"
        )


def _plan_changes(
    table_dir: str, start: int, end: int,
    map_meta: tuple = (None, None), map_version: int = 0,
) -> list[dict]:
    """Driver-side plan of the add-rows feed for versions (start, end]:
    one dict per (commit, partition entry) with the entry's immutable
    file list. Metadata-only commits plan nothing; a RESTORE (or any
    other non-additive op) in the range always RAISES — unlike
    `read_table_changes`'s snapshot diff, a version-cursor stream
    cannot re-attribute republished rows without double-counting.
    Never touches Spark — this is the metadata half,
    `CommitLogStreamReader.read` is the data half.

    ``map_meta``/``map_version`` are the column-mapping metadata the
    reader captured at stream start: mapped commits in range serve
    through that map (the executor projects physical file names to the
    stream's logical schema); a LATER map change raises (restart), and
    a materialize in range raises via `_check_map_stable` (it re-based
    the physical names, so one projection cannot span it)."""
    from nshm2022db_spark.streaming.sinks import table_history

    out: list[dict] = []
    hist = table_history(table_dir)
    mats = _materialize_versions(hist)
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
        _check_stream_map(m, map_meta, map_version, table_dir, mats)
        if op not in _ADDITIVE_OPS:
            if op == "rewrite" and m.get("data_change") is False:
                # compaction / Z-order (Delta's dataChange=false): a
                # provable restatement — the stream keeps flowing
                # across table maintenance instead of dying on it (a
                # materialize is caught by _check_stream_map above for
                # every commit BELOW it; itself it stages nothing)
                continue
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


def _entry_files(table_dir: str, dirs, entry: str) -> list[str]:
    """Every parquet file of one partition entry across its generation
    dirs — the immutable file list a read unit captures at plan time."""
    from nshm2022db_spark.streaming.sinks import _entry_dirs

    files: list[str] = []
    for dirname in _entry_dirs(dirs):
        d = os.path.join(table_dir, dirname, entry)
        if os.path.isdir(d):
            files += sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    return files


def _dv_added_bounds(
    table_dir: str, keys: list[str], cur_dirs: list[str], prev_dirs: list[str]
) -> tuple:
    """(per-column {col: (lo, hi)} bounds, any) over the key TUPLES
    ADDED by a dv change (cur − prev) — driver-side pyarrow over the
    delete-sized key files, zero Spark jobs (the same data the batch
    path broadcasts). ``keys`` may be composite (VERDICT r10 #2)."""
    import pyarrow.parquet as pq

    def keys_of(dirs: list[str]) -> set:
        out: set = set()
        for d in dirs:
            dd = os.path.join(table_dir, d)
            if not os.path.isdir(dd):
                continue
            for f in sorted(os.listdir(dd)):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(dd, f), columns=keys)
                    out.update(zip(*[t[k].to_pylist() for k in keys]))
        return out

    added = {
        tup
        for tup in keys_of(cur_dirs) - keys_of(prev_dirs)
        if all(x is not None for x in tup)
    }
    if not added:
        return None, False
    bounds = {
        k: (min(vs), max(vs)) for k, vs in zip(keys, zip(*added))
    }
    return bounds, True


def _typed_plan(
    table_dir: str, start: int, end: int,
    map_meta: tuple = (None, None), map_version: int = 0,
) -> list[dict]:
    """Driver-side plan of the TYPED change feed for versions
    (start, end] — the streaming half of `read_table_changes_typed`
    (sinks.py), unit for unit:

    * append → the stage's entries as ``insert`` units;
    * overwrite / rewrite / merge → map-diff PAIRS (cur content insert,
      prev content delete) per touched entry, except entries whose dir
      list merely GREW (a merge's unscanned-partition insert): those
      plan only the added generations as inserts;
    * delete (key tombstone) and a merge's dv change → ``delete`` image
      units over the PRIOR version's stats-pruned entries, carrying the
      key-file lists; the executor semi-filters rows to the ADDED keys
      (cur dv − prev dv) after anti-filtering the prior version's own
      tombstones — no re-deletes;
    * metadata-only commits plan nothing; restore/clone/migrate raise.

    Every unit is tombstone-aware: insert/delete file units carry their
    version's dv file list and the executor anti-filters hidden keys,
    so an image matches what `read_table_changes_typed` computes for
    the same commit (pinned stream-equals-batch by the oracle)."""
    from nshm2022db_spark.streaming.sinks import (
        _dv_keys,
        _entry_dirs,
        _stats_prune,
        table_history,
    )

    hist = table_history(table_dir)
    by_v = {m["version"]: m for m in hist}
    mats = _materialize_versions(hist)
    units: list[dict] = []
    for v in range(start + 1, end + 1):
        m = by_v.get(v)
        if m is None:
            raise ValueError(
                f"commit {v} of {table_dir} was vacuumed before the "
                "stream read it; keep retention above the max consumer lag"
            )
        if "partitions" not in m or "mor" in m:
            raise ValueError(
                f"{table_dir} is not a partition-mapped table; the typed "
                "commitlog stream reads those only"
            )
        op = m.get("op")
        # ONE hoisted map guard ahead of the op dispatch (r13 — the
        # r12 refusal lifted): commits covered by the map the stream
        # captured at start serve through it (the executor projects
        # physical file names to the stream's logical schema — rename
        # and drop are metadata-only, so physical names are stable); a
        # LATER map change is a schema change the fixed stream schema
        # cannot express and raises for a restart, Delta's own
        # streaming schema-change behavior
        _check_stream_map(m, map_meta, map_version, table_dir, mats)
        if op in ("set-constraints", "evolve"):
            continue
        if op not in (
            "append", "overwrite", "rewrite", "delete", "merge", "update"
        ):
            raise ValueError(
                f"commit {v} is {op!r} — its row images are not defined "
                "by a single commit's files; consume it via a recompute"
            )
        if op == "rewrite" and m.get("data_change") is False:
            # compaction (dataChange=false): restatement only — a
            # materialize is caught by _check_stream_map above for
            # every commit BELOW it; itself it stages nothing
            continue
        if op in ("merge", "update", "delete") and m.get("cdc"):
            # the merge's/update's/delete's _change_data sidecar holds its exact images
            # (update pre/post pairs, deletes, inserts) — plan one unit
            # per cdc file; _change_type and the partition column are
            # DATA columns there (value=None / ctype=None sentinels)
            cdc_abs = os.path.join(table_dir, m["cdc"])
            files = (
                sorted(
                    os.path.join(cdc_abs, f)
                    for f in os.listdir(cdc_abs)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(cdc_abs)
                else []
            )
            if files:
                units.append(
                    {
                        "files": files, "pcol": m["partition_col"],
                        "value": None, "version": v, "ctype": None,
                        "ts": m.get("committed_at"), "key": None,
                        "anti": [], "inc": [], "exc": [],
                    }
                )
            continue
        if (
            op in ("overwrite", "rewrite", "delete", "merge", "update")
            and v - 1 >= 1
            and v - 1 not in by_v
        ):
            raise ValueError(
                f"commit {v - 1} of {table_dir} (the diff base for {v}) "
                "was vacuumed; typed changes cannot stream from here"
            )
        prev = by_v.get(v - 1, {"partitions": {}}) if v > 1 else {
            "partitions": {}
        }
        pcol = m["partition_col"]
        ts = m.get("committed_at")
        m_dv = [os.path.join(table_dir, d) for d in m.get("dv", [])]
        p_dv = [os.path.join(table_dir, d) for d in prev.get("dv", [])]
        # "delete" routing (same as the batch feed): a PREDICATE delete
        # (delete_table, change_data=False) has no new dv file and
        # diffs as a partition-map rewrite; a KEY tombstone has one
        new_dv = (
            [d for d in m.get("dv", []) if d not in prev.get("dv", [])]
            if op == "delete"
            else []
        )

        def unit(files, value, ctype, anti, key=None, inc=None, exc=None):
            if files:
                units.append(
                    {
                        "files": files, "pcol": pcol, "value": value,
                        "version": v, "ctype": ctype, "ts": ts,
                        "key": key or _dv_keys(m) or _dv_keys(prev) or None,
                        "anti": anti, "inc": inc or [], "exc": exc or [],
                    }
                )

        if op == "append":
            stage_abs = os.path.join(table_dir, m["dir"])
            entries = (
                sorted(
                    n for n in os.listdir(stage_abs)
                    if n.startswith(f"{pcol}=")
                )
                if os.path.isdir(stage_abs)
                else []
            )
            for e in entries:
                unit(
                    _entry_files(table_dir, m["dir"], e),
                    e.split("=", 1)[1], "insert", m_dv,
                )
        elif op in ("overwrite", "rewrite", "merge", "update") or (
            op == "delete" and not new_dv
        ):
            cur_p, prev_p = m["partitions"], prev.get("partitions", {})
            touched = {
                e for e in set(cur_p) | set(prev_p)
                if cur_p.get(e) != prev_p.get(e)
            }
            extended: dict = {}
            for e in sorted(touched):
                cd = _entry_dirs(cur_p[e]) if e in cur_p else []
                pd_ = _entry_dirs(prev_p[e]) if e in prev_p else []
                value = e.split("=", 1)[1]
                if pd_ and cd[: len(pd_)] == pd_:
                    unit(
                        _entry_files(table_dir, cd[len(pd_):], e),
                        value, "insert", m_dv,
                    )
                    extended[e] = pd_
                else:
                    if e in cur_p:
                        unit(
                            _entry_files(table_dir, cur_p[e], e),
                            value, "insert", m_dv,
                        )
                    if e in prev_p:
                        unit(
                            _entry_files(table_dir, prev_p[e], e),
                            value, "delete", p_dv,
                        )
            if op == "merge" and m.get("dv") != prev.get("dv"):
                kcols = _dv_keys(m)
                if kcols:
                    bounds, any_ = _dv_added_bounds(
                        table_dir, kcols, m.get("dv", []), prev.get("dv", [])
                    )
                    if any_:
                        # delete-image base: untouched entries PLUS
                        # the prior generations of pure EXTENSIONS —
                        # their pair images are insert-only, so keys
                        # tombstoned there need their delete images
                        # from here (r11 review #1); a REWRITTEN
                        # entry's removed rows are already in its pair
                        # deletes (r10 review #2, same as the batch
                        # path)
                        base_parts = {
                            e: d
                            for e, d in prev.get("partitions", {}).items()
                            if e not in touched
                        }
                        base_parts.update(extended)
                        untouched = {
                            "partitions": base_parts,
                            "stats": prev.get("stats", {}),
                        }
                        for e, dirs in sorted(
                            _stats_prune(untouched, bounds).items()
                        ):
                            unit(
                                _entry_files(table_dir, dirs, e),
                                e.split("=", 1)[1], "delete", p_dv,
                                key=kcols, inc=m_dv, exc=p_dv,
                            )
        else:  # op == "delete" with a new dv file: key tombstone commit
            if m.get("legacy_layouts") or prev.get("legacy_layouts"):
                # the deleted keys' rows may live in a legacy layout the
                # current-layout plan below cannot see — the batch feed
                # reads all layouts, a silent stream would miss delete
                # images (r10 review #4)
                raise ValueError(
                    f"commit {v} of {table_dir} tombstones keys over "
                    "unmigrated legacy partition layouts; run "
                    "migrate_legacy_layouts or consume "
                    "read_table_changes_typed in batch"
                )
            kcols = _dv_keys(m)
            bounds, any_ = _dv_added_bounds(table_dir, kcols, new_dv, [])
            if not any_:
                continue
            nd_abs = [os.path.join(table_dir, d) for d in new_dv]
            for e, dirs in sorted(_stats_prune(prev, bounds).items()):
                unit(
                    _entry_files(table_dir, dirs, e),
                    e.split("=", 1)[1], "delete", p_dv,
                    key=kcols, inc=nd_abs, exc=[],
                )
    return units


def table_stream_schema(
    table_dir: str, change_types: bool = False
) -> StructType:
    """The stream's schema: the union of every live generation's parquet
    schema (schema evolution — later generations may add columns; older
    ones read those as NULL) + the partition column (string, the
    module-wide normalization) + `_commit_version` (long); with
    ``change_types``, also `_change_type` (string) and
    `_commit_timestamp` (timestamp) — the Delta CDF metadata columns.
    Footer-only metadata work, no Spark jobs."""
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
    # project the merged PHYSICAL schema through the head's column map
    # (r13): renamed fields surface under their logical names, dropped
    # physical fields disappear — the stream's schema is the same
    # logical view every batch read of the head serves
    from nshm2022db_spark.streaming.sinks import (
        _column_map,
        _dropped_physical,
    )

    cmap = _column_map(cur)  # {logical: physical}
    dropped = _dropped_physical(cur)
    if cmap or dropped:
        inv = {ph: lg for lg, ph in cmap.items()}
        merged = pa.schema(
            [
                (f.with_name(inv[f.name]) if f.name in inv else f)
                for f in merged
                if f.name not in dropped
            ],
            metadata=merged.metadata,
        )
    spark_schema = from_arrow_schema(merged, prefer_timestamp_ntz=True)
    spark_schema = spark_schema.add(pcol, "string").add(
        "_commit_version", "long"
    )
    if change_types:
        spark_schema = spark_schema.add("_change_type", "string").add(
            "_commit_timestamp", "timestamp"
        )
    return spark_schema


class CommitLogPartition(InputPartition):
    """One (commit, partition entry) unit of read work. Files are
    immutable once committed, so capturing paths at plan time is
    race-free by construction. Typed-feed units additionally carry the
    image type, the commit timestamp, and the key-file lists for
    executor-side tombstone anti-filtering (``anti``) and
    delete-image semi-filtering (``inc`` minus ``exc``). Units are
    byte-packed into ``CommitLogUnitGroup`` tasks at plan time — a unit
    is the correctness boundary, not the parallelism unit."""

    def __init__(
        self, files: list[str], pcol: str, value: str, version: int,
        ctype: str | None = None, ts: float | None = None,
        key: list[str] | None = None, anti: list[str] | None = None,
        inc: list[str] | None = None, exc: list[str] | None = None,
    ):
        self.files = files
        self.pcol = pcol
        self.value = value
        self.version = version
        self.ctype = ctype
        self.ts = ts
        # tombstone key COLUMNS (list; composite keys are tuples in the
        # dv files) — None when the unit needs no key filtering
        self.key = list(key) if key else None
        self.anti = anti or []
        self.inc = inc or []
        self.exc = exc or []


class CommitLogUnitGroup(InputPartition):
    """One executor TASK: a byte-packed run of plan units (r15, guide
    §6). A micro-batch over a day-partitioned table plans one unit per
    (commit, partition entry); at sf that is ~30 units of ~25 KB each,
    and one Python-source task per unit made the read stage pure
    per-task overhead (measured 1.9-4.7 s/batch for <1 MB of data).
    Packing mirrors Spark's own file-scan coalescing — cumulative
    max(bytes, 0) + openCost per file against a maxPartitionBytes
    target — so a real commit's worth of data still fans out wide
    while a tiny batch reads in one task."""

    def __init__(self, units: list[CommitLogPartition]):
        self.units = units


def _pack_units(
    units: list[CommitLogPartition],
    target_bytes: int,
    open_cost: int,
) -> list[CommitLogUnitGroup]:
    groups: list[CommitLogUnitGroup] = []
    cur: list[CommitLogPartition] = []
    cost = 0
    for u in units:
        c = 0
        for f in u.files:
            try:
                c += open_cost + max(os.path.getsize(f), 0)
            except OSError:
                c += open_cost
        c = c or open_cost
        if cur and cost + c > target_bytes:
            groups.append(CommitLogUnitGroup(cur))
            cur, cost = [], 0
        cur.append(u)
        cost += c
    if cur:
        groups.append(CommitLogUnitGroup(cur))
    return groups


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("commitlog source requires .option('path', dir)")
        self._schema = schema
        self._start = int(options.get("startingversion", 0))
        self._max_versions = int(options.get("maxversionsperbatch", 0))
        # task sizing for the unit packer (defaults mirror Spark's file
        # scan: 128 MiB target, 4 MiB per-file open cost); override with
        # .option("maxPartitionBytes", n) / .option("openCostInBytes", n)
        self._target_bytes = int(
            options.get("maxpartitionbytes", 128 << 20)
        )
        self._open_cost = int(options.get("opencostinbytes", 4 << 20))
        # typed mode (.option("changeTypes", "true")): emit the Delta
        # CDF surface — _change_type + _commit_timestamp per image —
        # and accept overwrite/rewrite/delete/merge commits (the
        # additive-only allow-list is the UNTYPED feed's constraint)
        self._typed = str(options.get("changetypes", "")).lower() in (
            "true", "1", "yes",
        )
        # column-mapping capture (r13): the stream serves every commit
        # through the map current at START — physical names are stable
        # across rename/drop (metadata-only), so one logical projection
        # covers the whole history up to here; a LATER map change
        # raises at plan time for a restart (Delta's schema-change
        # rule). Ships to executors with the reader for read()'s
        # field-name translation.
        from nshm2022db_spark.streaming.sinks import (
            _column_map,
            _dropped_physical,
            current_commit,
        )

        from nshm2022db_spark.streaming.sinks import _map_meta

        head_m = current_commit(self._path)
        self._cmap = dict(_column_map(head_m))  # {logical: physical}
        self._map_meta = _map_meta(head_m)
        self._map_version = head_m.get("version", 0)
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
        if self._typed:
            plan = _typed_plan(
                self._path, start["version"], end["version"],
                map_meta=self._map_meta, map_version=self._map_version,
            )
            units = [
                CommitLogPartition(
                    p["files"], p["pcol"], p["value"], p["version"],
                    ctype=p["ctype"], ts=p["ts"], key=p["key"],
                    anti=p["anti"], inc=p["inc"], exc=p["exc"],
                )
                for p in plan
            ]
        else:
            plan = _plan_changes(
                self._path, start["version"], end["version"],
                map_meta=self._map_meta, map_version=self._map_version,
            )
            units = [
                CommitLogPartition(
                    p["files"], p["pcol"], p["value"], p["version"]
                )
                for p in plan
            ]
        return _pack_units(units, self._target_bytes, self._open_cost)

    # -- data read (executors) ------------------------------------------
    def read(self, partition: CommitLogUnitGroup) -> Iterator:
        for unit in partition.units:
            yield from self._read_unit(unit)

    def _read_unit(self, partition: CommitLogPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        def key_set(dirs: list[str]) -> frozenset:
            # per-worker memo: a commit fanning out to many units would
            # otherwise re-parse the same immutable dv key files once
            # per unit (r10 review #7). Members are key TUPLES (single
            # or composite).
            ck = (tuple(partition.key), tuple(dirs))
            hit = _KEYSET_CACHE.get(ck)
            if hit is not None:
                return hit
            out: set = set()
            for d in dirs:
                if not os.path.isdir(d):
                    continue
                for f in sorted(os.listdir(d)):
                    if f.endswith(".parquet"):
                        t = pq.read_table(
                            os.path.join(d, f), columns=partition.key
                        )
                        out.update(
                            zip(*[t[k].to_pylist() for k in partition.key])
                        )
            if len(_KEYSET_CACHE) >= 64:
                _KEYSET_CACHE.clear()
            res = frozenset(out)
            _KEYSET_CACHE[ck] = res
            return res

        def key_mask(t, sel: frozenset, keep_matches: bool):
            """Arrow row mask: row's key tuple ∈ sel (or its negation).
            Single-column keys stay on the vectorized is_in path; NULL
            components never match (a NULL key hides nothing — the
            write paths also keep NULLs out of dv files, and sorted()
            over {None, int} would raise, ADVICE r10). Composite keys
            fall back to a tuple-set probe over the delete-image unit's
            rows — stats-pruned partitions, bounded by design."""
            if len(partition.key) == 1:
                vals = sorted(x[0] for x in sel if x[0] is not None)
                if not vals:
                    # empty selection: nothing matches — pa.array([])
                    # would be null-typed (Table.filter rejects it on
                    # zero-row files too, r11 review #5)
                    return pa.array(
                        [not keep_matches] * t.num_rows, type=pa.bool_()
                    )
                mask = pc.is_in(
                    t[partition.key[0]], value_set=pa.array(vals)
                )
                if keep_matches:
                    return pc.fill_null(mask, False)
                return pc.fill_null(pc.invert(mask), True)
            cols = [t[k].to_pylist() for k in partition.key]
            return pa.array(
                [(tup in sel) == keep_matches for tup in zip(*cols)],
                type=pa.bool_(),  # zero-row files: never null-typed
            )

        # executor-side key filters (delete-sized sets, the same data
        # the batch path broadcasts): drop rows the image version's own
        # tombstones hide, and for delete-image units keep only the
        # keys this commit ADDED (inc − exc)
        drop: frozenset = frozenset()
        keep: frozenset | None = None
        if partition.key is not None:
            if partition.anti:
                drop = key_set(partition.anti)
            if partition.inc:
                keep = key_set(partition.inc) - key_set(partition.exc)
        target = to_arrow_schema(self._schema)
        for path in partition.files:
            t = pq.read_table(path)
            if partition.key is not None:
                if any(k not in t.column_names for k in partition.key):
                    if keep is not None:
                        # a semi-filter over a file WITHOUT the key
                        # column matches nothing (the batch path's
                        # semi-join on the NULL evolved column emits
                        # zero rows — r10 review #3); an anti-filter
                        # over it drops nothing, so fall through
                        continue
                elif keep is not None:
                    t = t.filter(key_mask(t, keep - drop, True))
                elif drop:
                    t = t.filter(key_mask(t, drop, False))
            n = t.num_rows
            if n == 0:
                continue
            cols = []
            for field in target:
                if field.name == partition.pcol:
                    # cdc units (value=None) carry the partition column
                    # as a DATA column in the sidecar file
                    arr = (
                        pa.array([partition.value] * n, type=field.type)
                        if partition.value is not None
                        else t.column(field.name).cast(field.type)
                    )
                elif field.name == "_commit_version":
                    arr = pa.array([partition.version] * n, type=field.type)
                elif field.name == "_change_type":
                    # cdc units (ctype=None) read the per-row type the
                    # merge recorded (update_preimage / update_postimage
                    # / delete / insert)
                    arr = (
                        pa.array([partition.ctype] * n, type=field.type)
                        if partition.ctype is not None
                        else t.column(field.name).cast(field.type)
                    )
                elif field.name == "_commit_timestamp":
                    arr = (
                        pa.array(
                            [int(partition.ts * 1e6)] * n, type=pa.int64()
                        ).cast(field.type)
                        if partition.ts is not None
                        else pa.nulls(n, type=field.type)
                    )
                else:
                    # the stream's schema is LOGICAL; data files (and
                    # CDC sidecars) carry the stable PHYSICAL names —
                    # translate through the captured map (r13)
                    phys = self._cmap.get(field.name, field.name)
                    if phys in t.column_names:
                        arr = t.column(phys).cast(field.type)
                    else:  # schema evolution: column added later
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
        return table_stream_schema(
            self.options["path"],
            change_types=str(
                self.options.get("changetypes", "")
            ).lower() in ("true", "1", "yes"),
        )

    def streamReader(self, schema: StructType) -> CommitLogStreamReader:
        return CommitLogStreamReader(schema, dict(self.options))


def register_commitlog_source(spark: SparkSession) -> None:
    """Idempotent per-session registration (re-register replaces)."""
    spark.dataSource.register(CommitLogDataSource)
