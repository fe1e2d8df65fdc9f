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
protocol is explicit and minimal — the same model those formats use:

  * each transaction stages its result in a UNIQUE immutable data
    directory (never a predictable shared name),
  * then claims the next version by atomically linking a manifest into
    an append-only commit log (`_commits/{version}.json`, via
    write-tmp + os.link — creation fails if the version is taken, the
    local-filesystem equivalent of an object store's conditional put),
  * a loser of that race deletes its stage, re-reads the new current
    version, recomputes, and retries — OPTIMISTIC CONCURRENCY, so two
    concurrent writers serialize instead of silently dropping one
    writer's merge (the lost-update hazard of a mutable pointer),
  * manifests carry the cumulative batch-id list, so a replayed
    micro-batch (restart between write and checkpoint commit) sees its
    id already committed and no-ops — idempotent end-to-end,
  * readers resolve the max committed manifest and only ever see a
    fully-written version; the `_CURRENT` file remains as a hint and a
    legacy fallback for tables written by the pre-log layout.

Crash after staging but before commit leaves an orphan data dir that no
manifest references; `vacuum_uncommitted` removes those after a grace
period (mtime-based, so an in-flight writer's fresh stage survives).
"""

from __future__ import annotations

import base64
import contextlib
import json
import math
import os
import re
import shutil
import tempfile
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

_POINTER = "_CURRENT"
_COMMITS = "_commits"


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


def _write_hint(table_dir: str, manifest: dict) -> None:
    """Non-authoritative `_CURRENT` hint (atomic replace). The commit log
    is the source of truth; the hint only speeds up / legacy-bridges
    `current_commit`. Two racing hint writes can land out of order —
    harmless, because the log scan always wins when present."""
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="_hint-tmp-")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def _is_manifest(name: str) -> bool:
    return name.endswith(".json") and not name.endswith(".checkpoint.json")


def _read_json(path: str) -> dict | None:
    """None when the file vanished between listdir and open — a
    concurrent `vacuum_versions` retiring old manifests/checkpoints is
    allowed to race live readers; they skip what it unlinked (only
    DROPPED versions are ever unlinked, never the newest)."""
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _manifest_names(table_dir: str) -> list[str]:
    log = os.path.join(table_dir, _COMMITS)
    try:
        return sorted(n for n in os.listdir(log) if _is_manifest(n))
    except FileNotFoundError:
        return []


def current_commit(table_dir: str) -> dict:
    """The latest committed manifest {version, dir, batch_ids}: max entry
    of the append-only commit log, falling back to the legacy mutable
    pointer (pre-log tables used `v{N}` dirs named by version)."""
    names = _manifest_names(table_dir)
    # newest-first: vacuum never unlinks the newest, but an older name
    # from our listing may vanish under a concurrent retention pass
    for n in reversed(names):
        m = _read_json(os.path.join(table_dir, _COMMITS, n))
        if m is not None:
            return m
    ptr = _read_pointer(table_dir)
    ptr.setdefault("dir", f"v{ptr['version']}")
    return ptr


def try_commit(table_dir: str, manifest: dict) -> bool:
    """Claim `manifest['version']` by atomically linking a fully-written
    manifest file into the commit log. `os.link` fails with EEXIST when
    another writer claimed the version first — the compare-and-swap. On
    an object store this maps to a conditional put of the same key."""
    log = os.path.join(table_dir, _COMMITS)
    os.makedirs(log, exist_ok=True)
    # commit wall-clock, recorded once at publish (AS OF timestamp time
    # travel resolves against it); setdefault keeps replayed/rewritten
    # manifests' original times
    manifest.setdefault("committed_at", time.time())
    fd, tmp = tempfile.mkstemp(dir=log, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, os.path.join(log, f"{manifest['version']:020d}.json"))
            return True
        except FileExistsError:
            return False
    finally:
        os.unlink(tmp)


_CKPT_EVERY = 20  # ledger-checkpoint cadence (Delta: every 10 commits)


def _ledger_checkpoint(table_dir: str) -> tuple[int, set[int]]:
    """Latest batch-id ledger checkpoint (version, cumulative ids), or
    (0, empty). Checkpoints summarize ONLY the batch-id ledger — never
    table state — so they can't dangle at vacuumed data dirs; readers
    resolve data exclusively through manifests."""
    log = os.path.join(table_dir, _COMMITS)
    try:
        names = sorted(
            n for n in os.listdir(log) if n.endswith(".checkpoint.json")
        )
    except FileNotFoundError:
        return 0, set()
    for n in reversed(names):  # skip checkpoints a concurrent vacuum retired
        d = _read_json(os.path.join(log, n))
        if d is not None:
            return d["version"], set(d["batch_ids"])
    return 0, set()


def _write_ledger_checkpoint(table_dir: str, version: int, ids: set[int]) -> None:
    """Atomic (tmp + rename) so a crash mid-write leaves a sweepable
    .tmp, never a torn checkpoint; racing writers of the same version
    produce identical content, so last-rename-wins is harmless."""
    log = os.path.join(table_dir, _COMMITS)
    fd, tmp = tempfile.mkstemp(dir=log, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "batch_ids": sorted(ids)}, f)
    os.replace(tmp, os.path.join(log, f"{version:020d}.checkpoint.json"))


def committed_batch_ids(table_dir: str) -> set[int]:
    """All batch ids ever committed: the latest ledger CHECKPOINT plus
    the delta batch_ids of manifests after it — O(tail), not O(every
    version since table birth), which is what keeps a long-lived
    streaming land from re-reading thousands of manifests per
    micro-batch (the problem Delta's log checkpoints solve). Falls back
    to the legacy pointer's cumulative list for pre-log tables.
    Manifests carry only the ids THEIR transaction applied — cumulative
    lists would grow the log O(B²) over a stream's life (the first
    commit over a legacy table carries the pointer's ids forward once,
    so nothing is lost in migration)."""
    while True:
        names = _manifest_names(table_dir)
        ckpt_v, ids = _ledger_checkpoint(table_dir)
        if not names and ckpt_v == 0:
            return set(_read_pointer(table_dir)["batch_ids"])
        log = os.path.join(table_dir, _COMMITS)
        restart = False
        for n in names:
            if int(n.split(".")[0]) <= ckpt_v:
                continue
            m = _read_json(os.path.join(log, n))
            if m is None:
                # a concurrent vacuum rolled this manifest's ids into a
                # NEWER checkpoint and unlinked it between our listing
                # and the open; skipping would LOSE those ids (a
                # replayed batch could re-apply) — restart the scan,
                # which now sees that checkpoint. A loop, not recursion:
                # sustained vacuum churn on this hot per-micro-batch
                # path must not grow the Python stack.
                restart = True
                break
            ids.update(m["batch_ids"])
        if not restart:
            return ids


def _maybe_checkpoint_ledger(table_dir: str, version: int) -> None:
    """Every _CKPT_EVERY commits, roll the batch-id ledger up into a
    checkpoint so committed_batch_ids stays O(tail)."""
    if version % _CKPT_EVERY == 0:
        _write_ledger_checkpoint(table_dir, version, committed_batch_ids(table_dir))


def _publish(
    table_dir: str,
    manifest: dict,
    stage_path: str,
    keep_stage_on_conflict: bool = False,
) -> bool:
    """CAS-publish a staged manifest — the one publish sequence every
    writer shares (committed/partition/append/MOR transactions and
    compaction): refresh the stage mtime so vacuum's grace window
    restarts, link the manifest (the CAS), fail LOUDLY un-publishing if
    a misconfigured vacuum deleted the stage in the race window, then
    write the hint and roll the batch-id ledger. Returns False on a
    version conflict (stage deleted so the caller recomputes and
    retries — unless ``keep_stage_on_conflict``, the append REBASE path:
    staged data dirs are position-independent, so a loser that can prove
    logical non-conflict re-manifests the SAME stage instead of
    re-running its whole transaction)."""
    os.utime(stage_path)
    if try_commit(table_dir, manifest):
        if not os.path.isdir(stage_path):
            os.unlink(
                os.path.join(
                    table_dir, _COMMITS, f"{manifest['version']:020d}.json"
                )
            )
            raise RuntimeError(
                f"stage {os.path.basename(stage_path)} vacuumed before "
                f"commit on {table_dir}; raise vacuum grace_sec above the "
                "max writer stall"
            )
        _write_hint(table_dir, manifest)
        _maybe_checkpoint_ledger(table_dir, manifest["version"])
        return True
    if not keep_stage_on_conflict:
        shutil.rmtree(stage_path, ignore_errors=True)
    return False



def committed_transaction(
    spark: SparkSession,
    table_dir: str,
    compute,
    batch_id: int | None = None,
    max_retries: int = 10,
) -> None:
    """Run one optimistic-concurrency transaction: read the current
    version, `compute(base_df_or_None) -> DataFrame`, stage the result in
    a unique data dir, CAS the next version into the commit log. On
    conflict the stage is deleted and the whole transaction retries
    against the winner's version, so concurrent writers SERIALIZE — no
    lost updates. With `batch_id`, an already-committed id no-ops
    (replayed micro-batch idempotence)."""
    os.makedirs(table_dir, exist_ok=True)
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if "partitions" in cur:
            raise ValueError(
                f"{table_dir} is a partition-mapped table; "
                "use committed_partition_transaction"
            )
        if "mor" in cur:
            raise ValueError(
                f"{table_dir} is a merge-on-read keyed table; "
                "use append_keyed_mor"
            )
        seen = committed_batch_ids(table_dir)
        if batch_id is not None and batch_id in seen:
            return
        base = None
        if cur["version"] > 0:
            base = _read_parquet_fast(
                spark,
                os.path.join(table_dir, cur["dir"]),
                schema_json=_dir_schema(cur, cur["dir"]),
            )
        merged = compute(base)
        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        merged.write.mode("overwrite").parquet(stage_path)
        delta = [batch_id] if batch_id is not None else []
        if cur["version"] > 0 and not _manifest_names(table_dir):
            # first commit over a legacy-pointer table: carry its
            # cumulative ids into the log once, then deltas from here on
            delta = sorted(seen) + delta
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "batch_ids": delta,
        }
        _note_dir_schemas(
            manifest, cur, {stage: _file_schema_json(merged.schema)}
        )
        if _publish(table_dir, manifest, stage_path):
            return
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
    )


def _json_stat(v):
    """Manifest stats must round-trip through JSON losslessly and compare
    with plain operators — numeric columns only (None = all-NULL
    partition; bool is an int subclass and fine)."""
    if v is None or isinstance(v, (int, float)):
        return v
    raise TypeError(
        f"stats_cols support numeric columns only, got {type(v).__name__}"
    )


def _collect_stage_stats(
    stage_path: str, written: set[str], stats_cols: list[str]
) -> dict:
    """Per-partition {n, cols: {c: [min, max]}} for a freshly staged
    write, read from the PARQUET FOOTERS (pyarrow metadata) — no Spark
    job at all. Parquet column-chunk statistics are EXACT for the
    numeric physical types stats_cols allows (truncation only applies to
    string/binary), and the footers describe what is actually on disk,
    which is the contract manifest stats carry. At scale this is
    O(files) driver-side metadata reads, the same stats-backfill path a
    real table format uses; the write tasks' own footer writes already
    paid the computation."""
    import pyarrow.parquet as pq

    out = {}
    for e in written:
        d = os.path.join(stage_path, e)
        n = 0
        bounds: dict[str, list] = {c: [None, None] for c in stats_cols}
        nulls: dict[str, int | None] = {c: 0 for c in stats_cols}
        # bounds are only publishable if EVERY non-empty row group that
        # holds the column reported min/max — a stats-less group (a
        # foreign writer with statistics disabled) holds rows the
        # recorded bounds would not cover, and publishing them anyway
        # would let range pruning skip partitions with matching rows
        covered: dict[str, bool] = {c: True for c in stats_cols}
        for f in os.listdir(d):
            if not (f.endswith(".parquet") or f.startswith("part-")):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            n += md.num_rows
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for c in stats_cols:
                if c not in idx:
                    # column absent from this file (schema evolution):
                    # every one of its rows reads back NULL for c (and
                    # NULLs never match a range predicate, so absent
                    # files don't invalidate bounds)
                    if nulls[c] is not None:
                        nulls[c] += md.num_rows
                    continue
                for g in range(md.num_row_groups):
                    if md.row_group(g).num_rows == 0:
                        continue
                    st = md.row_group(g).column(idx[c]).statistics
                    if st is None:
                        nulls[c] = None  # unknown → record no null stat
                        covered[c] = False
                        continue
                    if nulls[c] is not None:
                        nc = st.null_count
                        nulls[c] = None if nc is None else nulls[c] + nc
                    if not st.has_min_max:
                        # rows exist here with unknown values: unless
                        # they are ALL null, the bounds can't claim
                        # coverage
                        if st.null_count is None or (
                            st.null_count != md.row_group(g).num_rows
                        ):
                            covered[c] = False
                        continue
                    lo, hi = bounds[c]
                    bounds[c][0] = st.min if lo is None else min(lo, st.min)
                    bounds[c][1] = st.max if hi is None else max(hi, st.max)
        out[e] = {
            "n": n,
            # an uncovered column is OMITTED, not published as
            # [None, None]: absent reads as "no bound, never pruned"
            # everywhere AND the append merge drops it from the merged
            # entry (a [None, None] would be mistaken for an all-NULL
            # column there, carrying the OLD bounds forward over rows
            # they don't cover)
            "cols": {
                c: [_json_stat(bounds[c][0]), _json_stat(bounds[c][1])]
                for c in stats_cols
                if covered[c]
            },
            "nulls": {c: k for c, k in nulls.items() if k is not None},
        }
    return out


_BLOOM_BITS = 65536  # default m: 8 KiB/partition/col, <1% FP up to ~n=6800
_BLOOM_HASHES = 5  # k: optimal for m/n ≈ 10
# Bloom sidecar FORMAT version. v2 = signed-zero canonicalization in
# the hash input (-0.0 and 0.0 share one canonical string). A bitmap
# persisted by a pre-v2 writer hashed '-0.0' keys under a different
# string than a v2 probe computes, so probing it could FALSELY prune
# the partition holding the match — the probe side therefore treats
# any spec whose ``v`` differs from the current format as no-bloom
# (never prunes), exactly like the older pre-type-tag ``t`` gate.
_BLOOM_FORMAT = 2
# merge pruning probes blooms per source key only when the source's
# distinct key set is at most this many (one limit-bounded job; the
# driver-side probe loop is partitions x keys x k bit tests)
_MERGE_BLOOM_PROBE_CAP = 64


def _bloom_position_cols(col, m: int, k: int) -> list:
    """The k Bloom probe positions of a value, as Column expressions — k
    independent xxhash64 streams (seeded by stream index as a leading
    hashed field) over the value's CANONICAL STRING form. Casting to
    string on BOTH the build and probe side sidesteps Spark's per-type
    hash encodings (int vs long vs string literals hash differently),
    so a probe literal of any compatible Python type agrees with the
    built bitmap."""
    s = col.cast("string")
    # signed zero: CAST(-0.0 AS STRING) is '-0.0' but -0.0 = 0.0 in SQL
    # equality — without canonicalizing, a 0.0 probe against a bitmap
    # built over -0.0 rows finds zero bits and FALSELY prunes the
    # partition holding its match (caught building the r14 probe-parity
    # test). Normalize the one string form divergent equality produces.
    s = F.when(s == "-0.0", F.lit("0.0")).otherwise(s)
    return [F.pmod(F.xxhash64(F.lit(i), s), F.lit(m)) for i in range(k)]


def _check_bloom_spec(m: int, k: int) -> None:
    """Reject bitmap geometries the byte packing can't represent BEFORE
    anything is staged — a bad m discovered mid-transaction would
    orphan the staged write."""
    if m <= 0 or m % 8:
        raise ValueError(f"bloom_bits must be a positive multiple of 8, got {m}")
    if k <= 0:
        raise ValueError(f"bloom_hashes must be positive, got {k}")


def _arrow_to_spark_type(at) -> "T.DataType | None":
    """Spark read type for an Arrow footer type, WHITELISTED: only types
    whose parquet→Spark inference mapping is unconditional (validated
    against Spark's own inference over every testdata table + edge-case
    writes, r15). None = not provably safe, caller must fall back to the
    inference read. Deliberately excluded: ns/INT96 timestamps (the
    nanosAsLong conf and INT96 rebase make their mapping conf-dependent),
    non-UTC tz, uint widths, date64."""
    import pyarrow as pa

    ty = pa.types
    if ty.is_boolean(at):
        return T.BooleanType()
    if ty.is_int8(at):
        return T.ByteType()
    if ty.is_int16(at):
        return T.ShortType()
    if ty.is_int32(at):
        return T.IntegerType()
    if ty.is_int64(at):
        return T.LongType()
    if ty.is_float32(at):
        return T.FloatType()
    if ty.is_float64(at):
        return T.DoubleType()
    if ty.is_string(at) or ty.is_large_string(at):
        return T.StringType()
    if ty.is_binary(at) or ty.is_large_binary(at):
        return T.BinaryType()
    if ty.is_date32(at):
        return T.DateType()
    if ty.is_timestamp(at):
        if at.unit != "us":
            return None
        if at.tz is None:
            return T.TimestampNTZType()
        if at.tz in ("UTC", "+00:00"):
            return T.TimestampType()
        return None
    if ty.is_decimal128(at):
        return T.DecimalType(at.precision, at.scale)
    if ty.is_list(at) or ty.is_large_list(at):
        el = _arrow_to_spark_type(at.value_type)
        return None if el is None else T.ArrayType(el, True)
    if ty.is_struct(at):
        fields = []
        for i in range(at.num_fields):
            f = at.field(i)
            dt = _arrow_to_spark_type(f.type)
            if dt is None:
                return None
            fields.append(T.StructField(f.name, dt, True))
        return T.StructType(fields)
    if ty.is_map(at):
        kt = _arrow_to_spark_type(at.key_type)
        vt = _arrow_to_spark_type(at.item_type)
        if kt is None or vt is None:
            return None
        return T.MapType(kt, vt, True)
    return None


# (file list, sizes, mtimes) -> StructType | False ("unsafe, don't retry").
# Committed data dirs are immutable and uuid-named, so a hit is always
# valid; the stat tuple in the key still guards the theoretical rewrite.
_FOOTER_SCHEMA_MEMO: dict = {}
_FOOTER_SCHEMA_MEMO_CAP = 8192


def _footer_schema(paths: list[str]) -> "T.StructType | None":
    """Driver-side schema for the parquet files under ``paths`` (dirs or
    files), via pyarrow footers — replaces Spark's schema-inference job
    (guide §1/§6: one Spark job per un-schema'd read, plus its plan
    resolve) with O(files) local metadata reads. Returns a schema ONLY
    when every footer carries the identical Arrow schema and every type
    is in the `_arrow_to_spark_type` whitelist; otherwise None and the
    caller runs the exact mergeSchema inference read it always did (the
    semantics-bearing path for schema evolution inside one dir)."""
    files: list[tuple[str, int, int]] = []
    try:
        for p in paths:
            if os.path.isfile(p):
                st = os.stat(p)
                files.append((p, st.st_size, st.st_mtime_ns))
                continue
            with os.scandir(p) as it:
                for e in it:
                    if e.is_dir():
                        return None  # nested layout: let Spark resolve
                    n = e.name
                    if n.endswith(".parquet") or n.startswith("part-"):
                        st = e.stat()
                        files.append((e.path, st.st_size, st.st_mtime_ns))
    except OSError:
        return None
    if not files:
        return None
    files.sort()
    key = tuple(files)
    hit = _FOOTER_SCHEMA_MEMO.get(key)
    if hit is not None:
        return hit or None
    import pyarrow.parquet as pq

    schema0 = None
    try:
        for f, _, _ in files:
            s = pq.read_schema(f)
            if schema0 is None:
                schema0 = s
            elif not s.equals(schema0):
                schema0 = None  # intra-dir evolution: mergeSchema's job
                break
    except Exception:
        schema0 = None
    out: "T.StructType | None" = None
    if schema0 is not None:
        fields = []
        for i in range(len(schema0)):
            f = schema0.field(i)
            dt = _arrow_to_spark_type(f.type)
            if dt is None:
                fields = None
                break
            fields.append(T.StructField(f.name, dt, True))
        if fields is not None:
            out = T.StructType(fields)
    if len(_FOOTER_SCHEMA_MEMO) >= _FOOTER_SCHEMA_MEMO_CAP:
        _FOOTER_SCHEMA_MEMO.clear()
    _FOOTER_SCHEMA_MEMO[key] = out if out is not None else False
    return out


def _read_parquet_fast(
    spark: SparkSession, *paths: str, schema_json: dict | None = None
) -> DataFrame:
    """`spark.read.parquet(*paths)` minus the schema-inference Spark job
    when the footers allow it (`_footer_schema`); byte-identical plan
    semantics either way — the fast path only fires when every footer
    agrees, which is exactly the case where inference returns the same
    schema.

    ``schema_json``: a manifest-recorded schema (`dir_schemas`, written
    once at commit time by `_note_dir_schemas`). When present the read
    supplies it directly — ZERO footer reads and ZERO stat() calls on
    the read path, the O(files) driver cost the footer path still paid
    per first touch (guide §6/§1: at 100 TB a 10k-file dir meant 10k
    serial driver footer reads; the writer already knew the schema)."""
    if schema_json is not None:
        return spark.read.schema(
            T.StructType.fromJson(schema_json)
        ).parquet(*paths)
    fast = _footer_schema(list(paths))
    if fast is not None:
        return spark.read.schema(fast).parquet(*paths)
    return spark.read.parquet(*paths)


def _dir_schema(m: dict, d: str) -> dict | None:
    """The manifest-recorded schema json for data dir ``d`` (None for
    pre-feature manifests or dirs whose footers refused a schema)."""
    return (m.get("dir_schemas") or {}).get(d)


def _dirs_schema(m: dict, dirs) -> dict | None:
    """One schema json valid for a MULTI-dir read (dv keys, MOR
    generations): every dir must have a recorded schema and they must
    all be identical — otherwise None and the caller's original
    footer/inference read runs (the schema-evolution path)."""
    ds = m.get("dir_schemas") or {}
    js = [ds.get(d) for d in dirs]
    if js and all(j is not None for j in js) and all(j == js[0] for j in js):
        return js[0]
    return None


def _nullable_type(dt: "T.DataType") -> "T.DataType":
    """The type with every nesting level forced nullable — what a
    parquet read of the written files reports (the writer's frame may
    carry non-null fields; parquet file sources surface them nullable,
    exactly as `_footer_schema` always derived them)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _nullable_type(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable_type(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _nullable_type(dt.keyType), _nullable_type(dt.valueType), True
        )
    return dt


def _file_schema_json(
    schema: "T.StructType", drop: str | None = None
) -> dict:
    """The as-written file schema of a staged frame, as manifest json:
    the partition column projected out (``partitionBy`` encodes it in
    dir names, not files) and every field nullable. This is what the
    writer KNOWS and what `_footer_schema` re-derived from the footers
    on every first read — recording it costs zero I/O."""
    return T.StructType(
        [
            T.StructField(f.name, _nullable_type(f.dataType), True)
            for f in schema.fields
            if f.name != drop
        ]
    ).jsonValue()


def _note_dir_schemas(
    manifest: dict, cur: dict, stages: dict | None = None
) -> None:
    """Record the staged dirs' file schemas in the manifest ONCE at
    write time and carry prior generations' entries forward — the
    manifest half of what `_footer_schema` derived per read (guide
    §6/§1: at 100 TB the footer path was O(files) serial driver reads
    per first touch plus O(files) stat() calls per read; the writer
    already knew the schema). ``dir_schemas`` maps data-dir name ->
    Spark schema json of THAT dir's parquet files (partition-mapped
    stages: the data files, which exclude the partition column).
    Entries for dirs the new manifest no longer references are
    dropped; a dir without an entry (pre-feature manifests, "."
    migration dirs, legacy layouts) reads through the exact
    footer/inference path it always did."""
    live = _manifest_dirs(manifest)
    out = {
        d: s
        for d, s in (cur.get("dir_schemas") or {}).items()
        if d in live
    }
    for stage, sj in (stages or {}).items():
        if stage and sj is not None and stage in live:
            out[stage] = sj
    if out:
        manifest["dir_schemas"] = out


def _distribute_for_partitioned_write(
    df: DataFrame, pcol: str, nvals: int | None = None
) -> DataFrame:
    """Hash-distribute a staged frame by its partition column before a
    ``partitionBy`` write — Iceberg's ``write.distribution-mode=hash``
    (guide §6). Without it every input task opens a writer per touched
    value: a one-task micro-batch writes its ~30 day files SERIALLY
    (measured 0.85 s vs 0.39 s for the same batch at sf0.1), and a
    wide input writes tasks × values small files. The NUMBERED
    repartition is user-specified partitioning, which AQE's
    byte-targeted coalescing preserves (the dedup_semdedup lesson —
    an un-numbered ``repartition(col)`` coalesces right back to one
    task on a tiny batch). N tracks ``spark.sql.shuffle.partitions``,
    the session's scale knob, so the driver's lower-core bench and a
    real cluster both size it; the tradeoff (Iceberg's too) is one
    writer task per partition VALUE per commit — right for
    micro-batch appends and partition-scoped rewrites, while the
    table-sized full-rewrite path keeps its unshuffled many-files
    layout (`rewrite_partition_table` + maxRecordsPerFile).

    ``nvals``: when the caller already knows how many distinct
    partition values it writes (the DML rewrites compute the value
    sets driver-side; the index maintainer knows its bucket count), a
    single-value write skips the shuffle — one value hashes to one
    task anyway, so the exchange would buy nothing and serialize the
    upstream compute — and a multi-value write CAPS the width at the
    value count (VERDICT r15 #4): rows hash into <= nvals distinct
    buckets regardless of N, so tasks beyond nvals are pure
    scheduling (29 empty tasks per 3-value merge batch at N=32)."""
    if nvals is not None and nvals <= 1:
        return df
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if nvals is not None:
        n = min(n, nvals)
    return df.repartition(n, F.col(pcol))


_INFERENCE_GUARD = threading.Lock()
_INFERENCE_STATE: dict[int, list] = {}  # id(spark) -> [depth, saved value]


@contextlib.contextmanager
def _no_partition_inference(spark: SparkSession):
    """Disable partition-dir type inference for the reads inside the
    block, REENTRANTLY per session: a bare save/set/restore pair is
    not — two interleaved callers (concurrent foreachBatch threads on
    one session) would capture each other's 'false' as the value to
    restore and leave inference off for the whole session forever.
    Depth-counted per session id, first caller saves, last restores."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    sid = id(spark)
    with _INFERENCE_GUARD:
        st = _INFERENCE_STATE.get(sid)
        if st is None:
            st = _INFERENCE_STATE[sid] = [0, spark.conf.get(key)]
            spark.conf.set(key, "false")
        st[0] += 1
    try:
        yield
    finally:
        with _INFERENCE_GUARD:
            st[0] -= 1
            if st[0] == 0:
                spark.conf.set(key, st[1])
                _INFERENCE_STATE.pop(sid, None)


def _collect_stage_blooms(
    spark: SparkSession,
    stage_path: str,
    partition_col: str,
    written: set[str],
    bloom_cols: list[str],
    m: int,
    k: int,
    schema_json: dict | None = None,
) -> dict:
    """Per-partition Bloom bitmaps over the named columns for a freshly
    staged write — the manifest half of Delta's bloom-filter index /
    Iceberg's puffin sidecars: equality predicates on high-cardinality
    columns can skip partitions whose min/max ranges all overlap (where
    range stats prove nothing). ONE distributed aggregation over only
    the staged files regardless of column count (each row contributes
    (col, position) pairs for every bloom column in one explode); the
    map-side partial collect_set is bounded by m per (partition, col),
    so the shuffle is O(partitions × cols × m) regardless of appended
    row count, and the driver packs each set to m/8 bytes of base64.
    Each spec records the COLUMN TYPE it hashed through (``t``) so the
    probe side can cast its literal identically — hashing the string
    form of a double ('3.0') and probing with an int ('3') would
    otherwise be a silent false negative. NULLs are not inserted
    (equality against NULL is the ``"null"`` prune spec's job)."""
    paths = [os.path.join(stage_path, e) for e in sorted(written)]
    # the writer's own schema when the caller has it (r16 #1 — zero
    # footer reads); footer derivation for pre-feature callers
    fast = (
        T.StructType.fromJson(schema_json)
        if schema_json is not None
        else _footer_schema(paths)
    )
    if fast is not None and partition_col not in fast.fieldNames():
        # zero-job read of the just-staged files (guide §1/§6) — the
        # schema comes from their own footers; the dir-name partition
        # column is supplied as string, same as the inference-off read
        df = (
            spark.read.schema(fast.add(partition_col, T.StringType()))
            .option("basePath", stage_path)
            .parquet(*paths)
        )
    else:
        with _no_partition_inference(spark):
            df = spark.read.option("basePath", stage_path).parquet(*paths)
    types = dict(df.dtypes)
    cols = [c for c in bloom_cols if c in df.columns]
    if not cols:
        return {}
    pair_arrays = [
        F.when(
            F.col(c).isNotNull(),
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_c"),
                        p.alias("_p"),
                    )
                    for p in _bloom_position_cols(F.col(c), m, k)
                ]
            ),
        ).otherwise(F.array())
        for c in cols
    ]
    rows = (
        df.select(
            F.col(partition_col).cast("string").alias("_e"),
            F.explode(F.flatten(F.array(*pair_arrays))).alias("_cp"),
        )
        .groupBy("_e", F.col("_cp._c").alias("_c"))
        .agg(F.collect_set(F.col("_cp._p")).alias("_ps"))
        .collect()
    )
    prefix = f"{partition_col}="
    out: dict[str, dict] = {}
    for r in rows:
        bits = bytearray(m // 8)
        for p in r["_ps"]:
            bits[p >> 3] |= 1 << (p & 7)
        out.setdefault(f"{prefix}{r['_e']}", {})[r["_c"]] = {
            "m": m,
            "k": k,
            "t": types[r["_c"]],
            "v": _BLOOM_FORMAT,
            "bits": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    return out


_PROBE_CACHE: dict = {}


def _bloom_probes(
    spark: SparkSession, value, m: int, k: int, t: str
) -> list[int] | None:
    """Probe positions for an equality value, computed BY SPARK (a 1-row
    local-relation job, cached per value+spec) so the probe hashes are
    bit-identical to the build side's xxhash64 — no Python
    reimplementation of the JVM hash to drift. The literal is cast to
    the COLUMN TYPE the bitmap recorded (``t``) before the canonical
    string cast, so an int probe against a double column hashes '3.0'
    exactly like the build did — probing the raw literal's own string
    form would be a silent false negative. Returns None (caller must
    not prune) when the literal doesn't cast to ``t``."""
    ck = (type(value).__name__, value, m, k, t)
    if ck not in _PROBE_CACHE:
        # try_cast, not cast: ANSI mode throws on a malformed literal
        # (e.g. probing a numeric column with 'abc'), where the right
        # answer is simply "can't prune"
        lit = F.lit(value).try_cast(t)
        cols = _bloom_position_cols(lit, m, k)
        row = spark.range(1).select(
            lit.isNull().alias("nul"),
            *[c.alias(f"p{i}") for i, c in enumerate(cols)],
        ).first()
        if len(_PROBE_CACHE) >= 4096:
            # bounded like _KEYSET_CACHE: per-source-key merge probing
            # feeds arbitrary CDC values through here — a long-lived
            # streaming driver must not leak (r11 review #4)
            _PROBE_CACHE.clear()
        _PROBE_CACHE[ck] = (
            None if row["nul"] else [row[f"p{i}"] for i in range(k)]
        )
    return _PROBE_CACHE[ck]


def _sql_probe_literal(v) -> str | None:
    """``v`` as a FOLD-SAFE Spark SQL literal, or None when it has no
    safe textual form (the caller falls back to the local-relation
    job). Strings go hex-encoded — ``CAST(X'..' AS STRING)`` — so the
    parser's quote/backslash escape rules can never reinterpret the
    value; numeric forms round-trip exactly (Python repr is the
    shortest round-trip form for floats, and Spark parses the
    decimal/scientific literal to the same double)."""
    if v is True or v is False:
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v) if -(2**63) <= v < 2**63 else None
    if isinstance(v, float):
        # explicit DOUBLE: a bare 12345678.0 parses as DECIMAL, whose
        # canonical STRING form ('12345678.0') diverges from the
        # double's ('1.2345678E7') — a float probing a string column
        # must hash the same text the slow path's double literal does
        return f"CAST({v!r} AS DOUBLE)" if math.isfinite(v) else None
    if isinstance(v, str):
        return f"CAST(X'{v.encode('utf-8').hex()}' AS STRING)"
    return None


def _bloom_probes_prefetch(
    spark: SparkSession, values: list, m: int, k: int, t: str
) -> None:
    """Warm `_PROBE_CACHE` for MANY equality values at once (r11 review
    #3 — the per-key merge probing would otherwise fire one driver job
    per distinct source key).

    Values with a fold-safe literal form (strings, longs, finite
    doubles, bools — every key type the registered tables use) are
    batched into a VALUES inline table: the probe projection is
    deterministic expressions over a LocalRelation, so Catalyst's
    ConvertToLocalRelation evaluates it AT PLAN TIME and the collect
    returns driver-side without scheduling a single task (measured r14:
    0.12 s vs 0.49 s for the createDataFrame job — which spread 31 rows
    over defaultParallelism tasks — per merge commit). Exotic value
    types keep the original one-job path."""
    todo = [
        v
        for v in dict.fromkeys(values)
        if v is not None
        and (type(v).__name__, v, m, k, t) not in _PROBE_CACHE
    ]
    if not todo:
        return
    # one VALUES statement per type CLASS: an inline table demands one
    # compatible type per column, and a mixed CDC key batch (ints and
    # strings) is legal input (pinned by TestBloomProbeFastPath)
    fast: dict[str, list] = {}
    slow_idx = set(range(len(todo)))
    for i, v in enumerate(todo):
        sl = _sql_probe_literal(v)
        if sl is not None:
            fast.setdefault(type(v).__name__, []).append((i, sl))
            slow_idx.discard(i)
    slow = [(i, todo[i]) for i in slow_idx]
    rows = []
    for chunk_src in fast.values():
        # chunk the VALUES text: thousands of CDC keys in one statement
        # would push parser time past the job it replaces
        for lo in range(0, len(chunk_src), 1024):
            chunk = chunk_src[lo:lo + 1024]
            vals_sql = ", ".join(f"({i}, {sl})" for i, sl in chunk)
            df = spark.sql(
                f"SELECT col1 AS _i, try_cast(col2 AS {t}) AS _v"
                f" FROM VALUES {vals_sql}"
            )
            lit = df["_v"]
            cols = _bloom_position_cols(lit, m, k)
            rows += df.select(
                df["_i"],
                lit.isNull().alias("nul"),
                *[c.alias(f"p{i}") for i, c in enumerate(cols)],
            ).collect()
    if slow:
        df = spark.createDataFrame([(i, v) for i, v in slow])
        lit = df[1].try_cast(t)
        cols = _bloom_position_cols(lit, m, k)
        rows += df.select(
            df[0].alias("_i"),
            lit.isNull().alias("nul"),
            *[c.alias(f"p{i}") for i, c in enumerate(cols)],
        ).collect()
    if len(_PROBE_CACHE) >= 4096:
        _PROBE_CACHE.clear()
    for r in rows:
        v = todo[r["_i"]]
        _PROBE_CACHE[(type(v).__name__, v, m, k, t)] = (
            None if r["nul"] else [r[f"p{i}"] for i in range(k)]
        )


def _split_prune(prune: dict | None) -> tuple[dict | None, dict]:
    """Split a prune spec into the range/null part `_stats_prune`
    understands and the equality probes ``{col: value}`` for
    `_bloom_prune`. An ``("eq", v)`` bound also contributes the
    degenerate range (v, v) for numeric v, so min/max stats and the
    bloom BOTH get a chance to disprove it."""
    if not prune:
        return prune, {}
    base: dict = {}
    eq: dict = {}
    for c, b in prune.items():
        if isinstance(b, tuple) and len(b) == 2 and b[0] == "eq":
            eq[c] = b[1]
            if isinstance(b[1], (int, float)) and not isinstance(b[1], bool):
                base[c] = (b[1], b[1])
        else:
            base[c] = b
    return base, eq


def _bloom_may_contain(
    spark: SparkSession, sp: dict | None, v, bits: bytes | None = None
) -> bool:
    """True unless the bitmap PROVES value ``v`` was never inserted.
    A missing bitmap, NULL probe, pre-type-tag spec, or uncastable
    literal can never prune (conservative, like min/max stats).
    ``bits`` may carry the pre-decoded bitmap so callers probing many
    values against one entry decode it once (r11 review #3)."""
    if sp is None or v is None or "t" not in sp:
        return True
    if sp.get("v") != _BLOOM_FORMAT:
        # sidecar written under an older hash-input format (pre
        # signed-zero canonicalization): its bit positions don't match
        # what today's probe computes, so it can never safely prune
        return True
    probes = _bloom_probes(spark, v, sp["m"], sp["k"], sp["t"])
    if probes is None:
        return True  # literal doesn't cast to the column type
    if bits is None:
        bits = base64.b64decode(sp["bits"])
    return all((bits[p >> 3] >> (p & 7)) & 1 for p in probes)


def _bloom_prune(
    spark: SparkSession, manifest: dict, parts: dict, eq: dict
) -> dict:
    """Entries of ``parts`` whose Bloom bitmaps do not DISPROVE the
    equality probes ``{col: value}``. Entries or columns without a
    bitmap are always kept — like min/max stats, a bloom only skips
    what it can prove absent. No false negatives by construction: the
    bitmap is the OR of every inserted value's probe positions, so a
    present value always finds all k bits set; a zero bit at any probe
    position proves the value was never inserted."""
    blooms = manifest.get("bloom", {})
    if not blooms:
        return parts
    out = {}
    for entry, dirname in parts.items():
        specs = blooms.get(entry, {})
        if all(_bloom_may_contain(spark, specs.get(c), v) for c, v in eq.items()):
            out[entry] = dirname
    return out


def committed_partition_transaction(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    compute,
    affected: list[str] | None = None,
    stats_cols: list[str] | None = None,
    max_retries: int = 10,
    max_records_per_file: int | None = None,
    allow_legacy: bool = False,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = _BLOOM_BITS,
    bloom_hashes: int = _BLOOM_HASHES,
    _drop_dv: bool = False,
    _drop_map: bool = False,
    data_change: bool = True,
) -> None:
    """One optimistic-concurrency transaction over a PARTITION-MAPPED
    table — the same CAS commit protocol as `committed_transaction`, but
    the manifest carries ``partitions: {"col=value": data_dir}`` so a
    transaction stages ONLY the partitions it rewrites and carries every
    other partition's mapping forward untouched. This is the file-level
    add/remove a real table format (Delta/Iceberg) does, at partition
    granularity: rewrite cost ∝ affected partitions, untouched files stay
    byte-identical, every committed version stays readable (snapshot
    isolation / time travel), and publish is ONE atomic manifest link —
    no rename sequence to roll back (VERDICT r04 #6: this replaces the
    erasure rewrite's dir-swap; a crash anywhere leaves the current
    version fully intact and at worst an unreferenced stage for vacuum).

    ``compute(base_or_None) -> DataFrame`` must return rows ONLY for the
    partitions it rewrites. ``affected`` lists the partition VALUES the
    transaction claims: a claimed partition absent from the output is
    DROPPED from the new version (the all-rows-erased case); None claims
    everything (full rewrite). Partitions compute writes are always
    claimed, listed or not.

    First use over a raw ``partitionBy`` layout migrates it IN PLACE:
    the pre-existing top-level ``col=value`` dirs enter the map under
    data dir ``"."`` with zero data movement (they are then immutable
    history — vacuum never touches non-``data-*`` names). Partition
    values round-trip as STRINGS (dir-name encoding), matching what a
    raw partitioned parquet read infers for string columns.

    ``stats_cols`` records per-partition min/max (+row count) for the
    named NUMERIC columns in the manifest, read from the staged files'
    parquet FOOTERS (`_collect_stage_stats` — exact for numeric types,
    zero extra Spark jobs, and describes what is actually on disk, so a
    lost-executor partial write can't record stats for data that isn't
    there). Unaffected partitions carry their stats forward with their
    mapping. Readers use them for data skipping
    (`read_keyed_table(prune=...)`) — the manifest half of
    Delta/Iceberg column-stats pruning."""
    if bloom_cols:
        _check_bloom_spec(bloom_bits, bloom_hashes)
    os.makedirs(table_dir, exist_ok=True)
    prefix = f"{partition_col}="
    for _ in range(max_retries):
        # hot path reads ONLY the newest manifest (O(1) in log length)
        cur = current_commit(table_dir)
        if cur["version"] > 0:
            if "partitions" not in cur:
                raise ValueError(
                    f"{table_dir} is a single-dir committed table; "
                    "use committed_transaction"
                )
        else:
            # migrate a raw partitionBy layout in place (version 0 =
            # the uncommitted top-level dirs)
            cur = {
                "version": 0,
                "partition_col": partition_col,
                "partitions": {
                    n: "."
                    for n in os.listdir(table_dir)
                    if n.startswith(prefix)
                    and os.path.isdir(os.path.join(table_dir, n))
                },
            }
        if cur.get("legacy_layouts") and not allow_legacy:
            # a rewrite computed from the current layout alone would
            # silently miss legacy-layout rows (an erasure would leave
            # the data it was meant to delete) — require migration first
            raise ValueError(
                f"{table_dir} has unmigrated legacy partition layouts; "
                "run migrate_legacy_layouts first (or pass "
                "allow_legacy=True for current-layout-only maintenance)"
            )
        base = _read_partition_map(spark, table_dir, cur)
        out = compute(base)
        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        writer = out.write.mode("overwrite")
        if max_records_per_file:
            # bound file size (Delta OPTIMIZE's target-file-size knob):
            # a 100 TB partition must land as many files, and when the
            # rows arrive sorted each file's row groups carry tight
            # disjoint min/max — the second level of data skipping
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.partitionBy(partition_col).parquet(stage_path)
        written = {
            n for n in os.listdir(stage_path) if n.startswith(prefix)
        }
        _check_entry_values(written)
        if cur.get("constraints") and written:
            _enforce_constraints(
                _read_partition_map(
                    spark,
                    table_dir,
                    {
                        "partition_col": partition_col,
                        "partitions": {e: stage for e in sorted(written)},
                        "dir_schemas": {
                            stage: _file_schema_json(
                                out.schema, drop=partition_col
                            )
                        },
                    },
                ),
                cur["constraints"],
                stage_path,
                manifest=cur,
            )
        claimed = (
            set(cur["partitions"]) | written
            if affected is None
            else {f"{prefix}{v}" for v in affected} | written
        )
        new_parts = {
            e: d for e, d in cur["partitions"].items() if e not in claimed
        }
        new_parts.update({e: stage for e in written})
        # stats: carry forward for carried entries, recompute for written
        # (footer metadata — zero extra Spark jobs)
        new_stats = {
            e: s
            for e, s in cur.get("stats", {}).items()
            if e in new_parts and e not in written
        }
        if stats_cols and written:
            # staged files carry PHYSICAL names — except a materialize
            # (_drop_map), whose stage IS the new logical-named basis
            scols = stats_cols if _drop_map else _physical_names(
                stats_cols, cur
            )
            new_stats.update(
                _collect_stage_stats(stage_path, written, scols)
            )
        # blooms: same carry-or-recompute contract as stats — rewritten
        # entries get fresh bitmaps (or none: bloom-less = never pruned)
        new_bloom = {
            e: b
            for e, b in cur.get("bloom", {}).items()
            if e in new_parts and e not in written
        }
        if bloom_cols and written:
            bcols = bloom_cols if _drop_map else _physical_names(
                bloom_cols, cur
            )
            new_bloom.update(
                _collect_stage_blooms(
                    spark, stage_path, partition_col, written,
                    bcols, bloom_bits, bloom_hashes,
                    schema_json=_file_schema_json(
                        out.schema, drop=partition_col
                    ),
                )
            )
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "partition_col": partition_col,
            "partitions": new_parts,
            "batch_ids": [],
            "op": "rewrite",
        }
        if not data_change:
            # Delta's dataChange=false: the rewrite provably RESTATES
            # rows (compaction, Z-order, tombstone materialization) —
            # change feeds skip the commit entirely instead of emitting
            # no-op pairs, and additive consumers stay sound across it
            manifest["data_change"] = False
        if new_stats:
            manifest["stats"] = new_stats
        if new_bloom:
            manifest["bloom"] = new_bloom
        if cur.get("constraints"):
            manifest["constraints"] = cur["constraints"]
        if cur.get("legacy_layouts"):
            manifest["legacy_layouts"] = cur["legacy_layouts"]
        if not _drop_map:
            _carry_column_map(manifest, cur)
        if cur.get("dv") and not _drop_dv:
            # tombstones survive rewrites: the rewritten partitions
            # re-materialize their rows unfiltered, but reads keep
            # anti-joining the carried keys (materialize_tombstones is
            # the one transaction that clears them)
            manifest["dv"] = cur["dv"]
            manifest["dv_key"] = cur["dv_key"]
        _note_dir_schemas(
            manifest,
            cur,
            {
                stage: _file_schema_json(out.schema, drop=partition_col)
                if written
                else None
            },
        )
        if _publish(table_dir, manifest, stage_path):
            return
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
    )


class AuditError(RuntimeError):
    """A write-audit-publish audit rejected the staged batch; nothing
    was published and the stage was removed."""


class ConstraintViolation(RuntimeError):
    """A staged write (or ADD CONSTRAINT over existing data) violated a
    table CHECK constraint; nothing was published."""


def set_table_constraints(
    spark: SparkSession, table_dir: str, exprs: list[str]
) -> int:
    """Declare CHECK constraints on a partition-mapped committed table
    (Delta's ALTER TABLE ADD CONSTRAINT): boolean SQL expressions every
    row must satisfy, stored in the manifest and enforced on EVERY
    subsequent write transaction before its manifest CAS — a violating
    batch is never published, streaming or batch, with no opt-in
    needed at the write site (the difference from the per-call
    ``audit``). Like Delta, adding a constraint first validates the
    EXISTING data (one scan) and refuses if any current row violates
    it. Metadata-only commit; returns the new version.

    Expressions are LOGICAL-schema SQL — on a column-mapped table
    (RENAME/DROP COLUMN history, r13) declare in the CURRENT names;
    the validation scan below reads the logical view (a stale physical
    name fails to resolve, loudly), and every later write enforces on
    its staged frame projected through the then-current map
    (`_enforce_constraints`). Renaming or dropping a column a
    constraint references keeps refusing (`_check_mappable`), so a
    declared expression's names never silently decouple."""
    for e in exprs:
        F.expr(e)  # fail fast on unparseable expressions
    for _ in range(10):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        existing = read_keyed_table(spark, table_dir)
        bad = _first_violation(existing, exprs)
        if bad is not None:
            raise ConstraintViolation(
                f"existing data violates {bad!r}; constraint not added"
            )
        stage = f"data-{uuid.uuid4().hex}"
        os.makedirs(os.path.join(table_dir, stage), exist_ok=True)
        manifest = {
            k: cur[k]
            for k in (
                "partition_col", "partitions", "stats", "bloom",
                "legacy_layouts", "dv", "dv_key",
                "column_map", "dropped_columns", "dir_schemas",
            )
            if k in cur
        }
        manifest["version"] = cur["version"] + 1
        manifest["dir"] = stage
        manifest["constraints"] = sorted(set(exprs))
        manifest["batch_ids"] = []
        manifest["op"] = "set-constraints"
        if _publish(table_dir, manifest, os.path.join(table_dir, stage)):
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def _first_violation(df: DataFrame | None, exprs: list[str]) -> str | None:
    """The first constraint (sorted order) some row of ``df`` violates,
    or None. NULL predicate results count as violations (a CHECK must
    prove truth), matching the strict reading a data contract wants."""
    if df is None:
        return None
    for e in sorted(set(exprs)):
        ok = F.expr(e)
        if df.filter(~F.coalesce(ok, F.lit(False))).limit(1).count() > 0:
            return e
    return None


def _enforce_constraints(
    staged: DataFrame, exprs: list[str] | None, stage_path: str,
    manifest: dict | None = None,
) -> None:
    """Validate a staged write against the table's CHECK constraints
    BEFORE its manifest CAS — the constraint half of write-audit-
    publish: on violation the stage is deleted and the transaction
    fails loudly; readers never saw a row.

    Constraint expressions are LOGICAL-schema SQL (r13 — declared and
    enforced in the names the user sees): pass the commit ``manifest``
    so a column-mapped table's physical staged frame projects through
    its map first. Pre-rename constraints keep resolving — a column a
    constraint references refuses RENAME/DROP (`_check_mappable`), so
    its logical name never moves. Safe on an already-logical frame
    (materialize's stage): `_to_logical` only renames PHYSICAL names,
    which rename_column keeps disjoint from live logical ones."""
    if not exprs:
        return
    bad = _first_violation(_to_logical(staged, manifest or {}), exprs)
    if bad is not None:
        shutil.rmtree(stage_path, ignore_errors=True)
        raise ConstraintViolation(
            f"staged write violates {bad!r}; nothing published"
        )


def _rebase_conflict(
    table_dir: str, base: dict, head: dict, written: set[str]
) -> str | None:
    """Delta-style LOGICAL conflict detection for an already-staged
    append (VERDICT r06 #4): decide whether a CAS loser whose base was
    ``base`` can re-manifest its immutable stage on top of ``head``
    WITHOUT re-running the transaction. Returns None when safe, else the
    reason the full optimistic re-run is required.

    Safe means: every intervening commit is a plain append that touched
    only partitions DISJOINT from ours, and nothing that gates a commit
    changed under us — partition spec, CHECK constraints (ours were
    enforced against ``base``'s), tombstones/DVs, legacy layouts. Those
    conservative checks make the rebase a pure manifest rebuild: our
    stage's entries still merge against exactly the per-entry state we
    computed them from (disjointness ⇒ the winners never moved them),
    so stats/bloom merges replay byte-identically."""
    for k in (
        "partition_col", "constraints", "dv", "dv_key", "legacy_layouts",
        "column_map", "dropped_columns",
    ):
        if head.get(k) != base.get(k):
            return f"{k} changed"
    log = os.path.join(table_dir, _COMMITS)
    prev = base.get("partitions", {})
    for v in range(base["version"] + 1, head["version"] + 1):
        m = _read_json(os.path.join(log, f"{v:020d}.json"))
        if m is None:
            return f"manifest {v} vacuumed mid-race"
        if m.get("op") not in ("append", "merge", "update", "delete"):
            return f"commit {v} is {m.get('op')!r}"
        # a merge (or standalone update/predicate delete) is rebase-
        # transparent like an append: the entries it rewrote/extended/
        # dropped show up in the map diff below, and a merge or
        # key-tombstone delete that changed tombstones trips the dv
        # check above — so disjointness carries the same guarantee
        # (VERDICT r09 #1 race contract: a disjoint append rebases
        # over a published merge)
        parts = m.get("partitions", {})
        touched = {e for e in parts if parts.get(e) != prev.get(e)}
        touched |= {e for e in prev if e not in parts}
        if touched & written:
            return f"commit {v} touched {sorted(touched & written)[:3]}"
        prev = parts
    return None


def append_partition_transaction(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    batch_df: DataFrame,
    stats_cols: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    audit=None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = _BLOOM_BITS,
    bloom_hashes: int = _BLOOM_HASHES,
    n_partition_values: int | None = None,
) -> set[str] | None:
    """APPEND a batch to a partition-mapped table as one commit — the
    write path a time-partitioned streaming land needs. A partition-map
    entry may hold a LIST of data dirs (generations); appending extends
    the touched entries' lists with the batch's stage instead of
    rewriting them, so the cost is O(batch), never O(partition) — the
    multi-file add of a real table format, with `compact_partition_table`
    later collapsing long lists. Untouched entries carry forward.

    Stats merge instead of replace: the stage's min/max widen the
    entry's recorded bounds and row counts sum. An entry with existing
    data but NO recorded stats stays stat-less (merging would claim
    bounds for unscanned files — stat-less means "never pruned", which
    is always safe).

    ``batch_id`` gives foreachBatch idempotence exactly like
    `committed_transaction`: a replayed micro-batch whose id is already
    in the log no-ops.

    Returns the set of partition entries (``"col=value"`` dir names)
    this commit wrote — a caller that needs the batch's touched
    partitions (e.g. a refresh job) reads them here instead of paying a
    second scan of the batch source (r15, guide §1). A batch-id no-op
    returns None (the touched set is unknown without re-planning).

    ``audit`` enables WRITE-AUDIT-PUBLISH (Iceberg's WAP pattern): after
    the batch is staged but BEFORE the manifest CAS, ``audit(staged_df)``
    runs against a read of exactly what would become visible. Returning
    False (or raising) aborts the commit — the stage is deleted, readers
    never saw a row, and an `AuditError` (or the audit's own exception)
    propagates. Bad data can then never become visible: the audit reads
    the same immutable files the table would have served.

    CAS losers REBASE when they can (Delta's logical conflict
    resolution): staged data dirs are position-independent, so a loser
    whose intervening commits `_rebase_conflict` proves disjoint
    re-manifests the SAME stage on top of the winner — no Spark re-run,
    no footer re-scan. Concurrent appends to disjoint partitions then
    each pay their write exactly once regardless of commit order; only
    a LOGICAL conflict (same entry touched, spec/constraint/tombstone
    change, non-append op) falls back to the full optimistic re-run.
    An ``audit`` is the one thing a rebase DOES re-run (against the
    head it actually publishes on): unlike CHECK constraints — per-row
    predicates whose validity disjoint intervening appends cannot
    change — an audit may assert table-state invariants, so skipping
    it on rebase would let two concurrently-audited batches publish a
    state neither audit saw."""
    if bloom_cols:
        _check_bloom_spec(bloom_bits, bloom_hashes)
    os.makedirs(table_dir, exist_ok=True)
    prefix = f"{partition_col}="
    stage = stage_path = None
    written: set[str] = set()
    staged_stats: dict = {}
    staged_blooms: dict = {}
    # the table state the kept stage was last conflict-checked against
    # (ADVICE r08): every retry iteration re-validates from here to the
    # freshly-read head, so a commit landing in ANY read gap — not just
    # the one immediately after a failed CAS — is conflict-checked
    # before the stage re-manifests (Delta's per-attempt re-validation
    # from the read version to the latest version)
    validated_base: dict | None = None
    try:
        for _ in range(max_retries):
            # hot path: newest manifest + checkpointed ledger (O(tail))
            cur = current_commit(table_dir)
            if cur["version"] == 0:
                cur = {"version": 0, "partitions": {}}
            elif "partitions" not in cur:
                raise ValueError(
                    f"{table_dir} is a single-dir committed table; "
                    "use committed_transaction"
                )
            elif cur["partition_col"] != partition_col:
                # the current SPEC owns the layout — after partition
                # evolution an append with the old column would land data
                # under the wrong dir names and corrupt the map
                raise ValueError(
                    f"{table_dir} is partitioned by "
                    f"{cur['partition_col']!r}; append supplied "
                    f"{partition_col!r}"
                )
            if batch_id is not None and batch_id in committed_batch_ids(
                table_dir
            ):
                return None
            if (
                stage_path is not None
                and cur["version"] > validated_base["version"]
            ):
                # per-attempt re-validation (TOCTOU close): commits that
                # landed since the stage was last validated must prove
                # disjoint+spec-stable or the stage is discarded and the
                # whole transaction re-runs against the new base (which
                # re-enforces the new constraints and re-audits)
                if (
                    _rebase_conflict(table_dir, validated_base, cur, written)
                    is not None
                ):
                    shutil.rmtree(stage_path, ignore_errors=True)
                    stage_path = None
                else:
                    validated_base = cur
                    if audit is not None and written:
                        # WAP audits may check TABLE-STATE invariants
                        # (not just per-row predicates like constraints,
                        # whose validity disjointness preserves) — so a
                        # rebase re-runs the audit against the base it
                        # will actually publish on. Cheap: the staged
                        # files are immutable, nothing is re-written or
                        # re-footer-scanned (r9 review).
                        staged = _read_partition_map(
                            spark,
                            table_dir,
                            {
                                "partition_col": partition_col,
                                "partitions": {
                                    e: stage for e in sorted(written)
                                },
                                "dir_schemas": {stage: stage_schema},
                            },
                        )
                        try:
                            # audits are written against the table's
                            # LOGICAL schema; the staged frame carries
                            # physical names (r12 review sweep 2 #2)
                            verdict = audit(_to_logical(staged, cur))
                        except Exception:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise
                        if not verdict:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise AuditError(
                                f"audit rejected rebased batch for "
                                f"{table_dir}; nothing published"
                            )
            if stage_path is None:
                stage = f"data-{uuid.uuid4().hex}"
                stage_path = os.path.join(table_dir, stage)
                # logical -> stable physical names (column mapping); an
                # old-name or dropped-name column is rejected here
                # (hash-distributed by the partition value: guide §6,
                # parallel writers + one file per value per commit)
                phys = _to_physical_batch(batch_df, cur)
                stage_schema = _file_schema_json(
                    phys.schema, drop=partition_col
                )
                _distribute_for_partitioned_write(
                    phys, partition_col, nvals=n_partition_values
                ).write.mode(
                    "overwrite"
                ).partitionBy(partition_col).parquet(stage_path)
                written = {
                    n for n in os.listdir(stage_path) if n.startswith(prefix)
                }
                _check_entry_values(written)
                if (audit is not None or cur.get("constraints")) and written:
                    staged = _read_partition_map(
                        spark,
                        table_dir,
                        {
                            "partition_col": partition_col,
                            "partitions": {e: stage for e in sorted(written)},
                            "dir_schemas": {stage: stage_schema},
                        },
                    )
                    _enforce_constraints(
                        staged, cur.get("constraints"), stage_path,
                        manifest=cur,
                    )
                    if audit is not None:
                        try:
                            # audits are written against the table's
                            # LOGICAL schema; the staged frame carries
                            # physical names (r12 review sweep 2 #2)
                            verdict = audit(_to_logical(staged, cur))
                        except Exception:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise
                        if not verdict:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise AuditError(
                                f"audit rejected staged batch for "
                                f"{table_dir}; nothing published"
                            )
                # footer scans are per-stage facts: collect ONCE, reuse
                # across rebase retries (the files never change)
                staged_stats = (
                    _collect_stage_stats(
                        stage_path, written, _physical_names(stats_cols, cur)
                    )
                    if stats_cols and written
                    else {}
                )
                staged_blooms = (
                    _collect_stage_blooms(
                        stage_path=stage_path, spark=spark,
                        partition_col=partition_col, written=written,
                        bloom_cols=_physical_names(bloom_cols, cur),
                        m=bloom_bits, k=bloom_hashes,
                        schema_json=stage_schema,
                    )
                    if bloom_cols and written
                    else {}
                )
                # staging enforced constraints/audit against THIS state
                validated_base = cur
            new_parts = {e: v for e, v in cur["partitions"].items()}
            for e in written:
                new_parts[e] = (
                    _entry_dirs(new_parts[e]) + [stage]
                    if e in new_parts
                    else stage
                )
            new_stats = {
                e: s for e, s in cur.get("stats", {}).items() if e in new_parts
            }
            if not stats_cols:
                # this append did not footer-scan: a written entry's
                # carried bounds no longer cover its new generation, so
                # keeping them would let pruning skip partitions that now
                # hold matching rows. Drop them — stat-less = never
                # pruned, always safe.
                for e in written:
                    new_stats.pop(e, None)
            if stats_cols and written:
                for e, add in staged_stats.items():
                    if e in cur["partitions"] and e not in cur.get("stats", {}):
                        continue  # pre-existing unstatted data: stay stat-less
                    old = new_stats.get(e)
                    if old is None:
                        new_stats[e] = add
                    else:
                        # merge ONLY columns scanned on both sides: an old
                        # column absent from this append's stats_cols was
                        # never footer-scanned in the new files, so
                        # carrying its bounds forward would claim coverage
                        # of unscanned data — dishonest stats that make
                        # pruning drop real rows. Dropped = stat-less =
                        # never pruned.
                        merged = {
                            "n": old["n"] + add["n"], "cols": {}, "nulls": {}
                        }
                        for c in add["cols"]:
                            if c in old["cols"]:
                                lo = [old["cols"][c][0], add["cols"][c][0]]
                                hi = [old["cols"][c][1], add["cols"][c][1]]
                                lo = [x for x in lo if x is not None]
                                hi = [x for x in hi if x is not None]
                                merged["cols"][c] = [
                                    min(lo) if lo else None,
                                    max(hi) if hi else None,
                                ]
                        # null counts are additive, but only when KNOWN on
                        # both sides — a side without the count (older
                        # manifest, footer without stats) drops the column
                        # (absent = never null-pruned, always safe)
                        for c, k in add.get("nulls", {}).items():
                            if c in old.get("nulls", {}):
                                merged["nulls"][c] = old["nulls"][c] + k
                        new_stats[e] = merged
            # blooms: a set-union structure, so appends MERGE by OR-ing
            # bitmaps — but only when both sides exist with the same
            # (m, k); anything else drops the entry's bloom (bloom-less =
            # never pruned), mirroring the stats drop-or-merge discipline
            # above.
            new_bloom = {
                e: b for e, b in cur.get("bloom", {}).items() if e in new_parts
            }
            if not bloom_cols:
                for e in written:
                    new_bloom.pop(e, None)
            elif written:
                for e in written:
                    add_b = staged_blooms.get(e)
                    if e in cur["partitions"] and e not in cur.get("bloom", {}):
                        continue  # pre-existing unbloomed data: stay bloom-less
                    old_b = cur.get("bloom", {}).get(e)
                    if add_b is None:
                        new_bloom.pop(e, None)
                        continue
                    if old_b is None:
                        new_bloom[e] = add_b  # brand-new entry
                        continue
                    merged_b = {}
                    for c, sp in add_b.items():
                        osp = old_b.get(c)
                        if (
                            osp
                            and osp["m"] == sp["m"]
                            and osp["k"] == sp["k"]
                            and osp.get("t") == sp.get("t")
                            # OR-merging bitmaps hashed under different
                            # format versions would mix incompatible
                            # probe spaces; a version mismatch drops
                            # the column's bloom instead (conservative)
                            and osp.get("v") == sp.get("v")
                        ):
                            ob = base64.b64decode(osp["bits"])
                            nb = base64.b64decode(sp["bits"])
                            merged_b[c] = {
                                "m": sp["m"],
                                "k": sp["k"],
                                "t": sp["t"],
                                "v": sp["v"],
                                "bits": base64.b64encode(
                                    bytes(a | b for a, b in zip(ob, nb))
                                ).decode("ascii"),
                            }
                    if merged_b:
                        new_bloom[e] = merged_b
                    else:
                        new_bloom.pop(e, None)
            manifest = {
                "version": cur["version"] + 1,
                "dir": stage,
                "partition_col": partition_col,
                "partitions": new_parts,
                "batch_ids": [batch_id] if batch_id is not None else [],
                "op": "append",
            }
            if new_stats:
                manifest["stats"] = new_stats
            if new_bloom:
                manifest["bloom"] = new_bloom
            if cur.get("constraints"):
                manifest["constraints"] = cur["constraints"]
            if cur.get("legacy_layouts"):
                manifest["legacy_layouts"] = cur["legacy_layouts"]
            _carry_column_map(manifest, cur)
            if cur.get("dv"):
                manifest["dv"] = cur["dv"]
                manifest["dv_key"] = cur["dv_key"]
            _note_dir_schemas(
                manifest, cur, {stage: stage_schema if written else None}
            )
            if _publish(
                table_dir, manifest, stage_path, keep_stage_on_conflict=True
            ):
                stage_path = None  # published: the stage is live table data
                return written
            # CAS lost. Keep the stage; the NEXT iteration's top-of-loop
            # re-validation decides rebase vs discard against the head it
            # will actually manifest on (checking an intermediate head
            # here would leave commits landing after it unchecked —
            # ADVICE r08's TOCTOU).
        raise RuntimeError(
            f"commit conflict persisted for {max_retries} retries on "
            f"{table_dir}"
        )
    finally:
        # give-up / audit-failure cleanup: an unpublished stage must not
        # leak (published stages reset stage_path above)
        if stage_path is not None:
            shutil.rmtree(stage_path, ignore_errors=True)


def overwrite_partition_transaction(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    batch_df: DataFrame,
    replace_where: list[str] | None = None,
    stats_cols: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    audit=None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = _BLOOM_BITS,
    bloom_hashes: int = _BLOOM_HASHES,
    n_partition_values: int | None = None,
) -> None:
    """INSERT OVERWRITE a partition-mapped table as one commit — the
    last Delta-core write mode beside append/delete/rewrite/evolve/
    clone (VERDICT r08 stretch #8).

    ``replace_where=None`` is DYNAMIC partition overwrite (Spark's
    ``partitionOverwriteMode=dynamic`` / Hive's INSERT OVERWRITE with
    dynamic partitions): exactly the partitions PRESENT in ``batch_df``
    are replaced — each points at the new stage as its ONLY data dir —
    and every other entry carries forward untouched. An empty batch is
    a no-op (nothing to replace).

    ``replace_where=[v1, ...]`` is Delta's ``replaceWhere`` on the
    partition column: the LISTED values are replaced; a batch row
    landing OUTSIDE them raises before anything publishes (Delta's
    predicate-containment check), and a listed value with no batch rows
    is DELETED from the map — its old files stay on disk as committed
    history, readable via time travel until a retention vacuum.

    Cost is O(batch + replaced entries), never O(table): untouched
    partitions' files are not read, moved, or rewritten. Stats/blooms
    for replaced entries are REPLACED by the stage's own footer scans
    (an overwrite cannot merge against bounds of data it just deleted);
    dropped when the call doesn't scan. CHECK constraints and the WAP
    ``audit`` gate the staged rows exactly like the append path; a
    deletion-only ``replace_where`` batch (no staged rows) still runs
    the audit — against an empty frame in the batch's schema — so an
    audited pipeline can never delete partitions un-audited.

    Commits tag ``op: "overwrite"``, so every reader of history that
    must refuse non-append semantics (change feed, additive CDC
    maintenance, the streaming table source, an appender's rebase)
    already treats it correctly as a logical barrier. Unmigrated legacy
    layouts REFUSE (a replaced value's legacy rows would survive the
    read union — the same miss a rewrite guards against).

    Concurrency follows the append path's rebase-aware CAS: a losing
    overwrite whose intervening commits are provably disjoint plain
    appends (none touching a REPLACED entry, no spec/constraint/DV/
    legacy change) re-manifests its immutable stage — concurrent
    appends to OTHER partitions and this overwrite each pay their
    write exactly once. An intervening append INTO a replaced entry is
    a real write-write conflict (the overwrite would silently erase
    it): the stage is discarded and the transaction re-runs, exactly
    Delta's ConcurrentAppendException-then-retry."""
    if bloom_cols:
        _check_bloom_spec(bloom_bits, bloom_hashes)
    os.makedirs(table_dir, exist_ok=True)
    prefix = f"{partition_col}="
    if replace_where is not None:
        claimed = {f"{prefix}{v}" for v in replace_where}
        _check_entry_values(claimed)
        if not claimed:
            return  # replace nothing = no-op
    stage = stage_path = None
    written: set[str] = set()
    replaced: set[str] = set()
    staged_stats: dict = {}
    staged_blooms: dict = {}
    validated_base: dict | None = None
    try:
        for _ in range(max_retries):
            cur = current_commit(table_dir)
            if cur["version"] == 0:
                cur = {"version": 0, "partitions": {}}
            elif "partitions" not in cur:
                raise ValueError(
                    f"{table_dir} is a single-dir committed table; "
                    "use committed_transaction"
                )
            elif cur["partition_col"] != partition_col:
                raise ValueError(
                    f"{table_dir} is partitioned by "
                    f"{cur['partition_col']!r}; overwrite supplied "
                    f"{partition_col!r}"
                )
            if cur.get("legacy_layouts"):
                raise ValueError(
                    f"{table_dir} has unmigrated legacy partition "
                    "layouts; an overwrite computed against the current "
                    "layout would leave replaced values' legacy rows "
                    "readable — run migrate_legacy_layouts first"
                )
            if batch_id is not None and batch_id in committed_batch_ids(
                table_dir
            ):
                return
            if (
                stage_path is not None
                and cur["version"] > validated_base["version"]
            ):
                # per-attempt re-validation, same TOCTOU discipline as
                # the append path — checked against the entries this
                # overwrite REPLACES
                if (
                    _rebase_conflict(table_dir, validated_base, cur, replaced)
                    is not None
                ):
                    shutil.rmtree(stage_path, ignore_errors=True)
                    stage_path = None
                else:
                    validated_base = cur
                    if audit is not None:
                        # deletion-only batches (written empty) audit an
                        # empty staged frame — an audited pipeline must
                        # not be able to delete partitions un-audited
                        # (ADVICE r09)
                        staged = (
                            _read_partition_map(
                                spark,
                                table_dir,
                                {
                                    "partition_col": partition_col,
                                    "partitions": {
                                        e: stage for e in sorted(written)
                                    },
                                    "dir_schemas": {stage: stage_schema},
                                },
                            )
                            if written
                            else batch_df.limit(0)
                        )
                        try:
                            # audits are written against the table's
                            # LOGICAL schema; the staged frame carries
                            # physical names (r12 review sweep 2 #2)
                            verdict = audit(_to_logical(staged, cur))
                        except Exception:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise
                        if not verdict:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise AuditError(
                                f"audit rejected rebased overwrite for "
                                f"{table_dir}; nothing published"
                            )
            if stage_path is None:
                stage = f"data-{uuid.uuid4().hex}"
                stage_path = os.path.join(table_dir, stage)
                # logical -> stable physical names (column mapping); an
                # old-name or dropped-name column is rejected here
                # (hash-distributed by the partition value: guide §6,
                # parallel writers + one file per value per commit)
                phys = _to_physical_batch(batch_df, cur)
                stage_schema = _file_schema_json(
                    phys.schema, drop=partition_col
                )
                _distribute_for_partitioned_write(
                    phys, partition_col, nvals=n_partition_values
                ).write.mode(
                    "overwrite"
                ).partitionBy(partition_col).parquet(stage_path)
                written = {
                    n for n in os.listdir(stage_path) if n.startswith(prefix)
                }
                _check_entry_values(written)
                if replace_where is None:
                    if not written:
                        return  # dynamic overwrite of nothing: no-op
                    replaced = set(written)
                else:
                    outside = written - claimed
                    if outside:
                        raise ValueError(
                            f"batch rows land outside replace_where "
                            f"{sorted(replace_where)}: "
                            f"{sorted(outside)[:3]} — Delta's "
                            "predicate-containment contract; widen "
                            "replace_where or filter the batch"
                        )
                    replaced = set(claimed)
                if (cur.get("constraints") and written) or audit is not None:
                    # constraints are per-row (nothing to enforce on an
                    # empty batch); the audit ALWAYS runs when provided —
                    # a deletion-only replaceWhere must not skip the gate
                    # its pipeline configured (ADVICE r09), so it audits
                    # an empty staged frame in the batch's schema
                    staged = (
                        _read_partition_map(
                            spark,
                            table_dir,
                            {
                                "partition_col": partition_col,
                                "partitions": {
                                    e: stage for e in sorted(written)
                                },
                                "dir_schemas": {stage: stage_schema},
                            },
                        )
                        if written
                        else batch_df.limit(0)
                    )
                    if written:
                        _enforce_constraints(
                            staged, cur.get("constraints"), stage_path,
                            manifest=cur,
                        )
                    if audit is not None:
                        try:
                            # audits are written against the table's
                            # LOGICAL schema; the staged frame carries
                            # physical names (r12 review sweep 2 #2)
                            verdict = audit(_to_logical(staged, cur))
                        except Exception:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise
                        if not verdict:
                            shutil.rmtree(stage_path, ignore_errors=True)
                            stage_path = None
                            raise AuditError(
                                f"audit rejected staged overwrite for "
                                f"{table_dir}; nothing published"
                            )
                staged_stats = (
                    _collect_stage_stats(
                        stage_path, written, _physical_names(stats_cols, cur)
                    )
                    if stats_cols and written
                    else {}
                )
                staged_blooms = (
                    _collect_stage_blooms(
                        stage_path=stage_path, spark=spark,
                        partition_col=partition_col, written=written,
                        bloom_cols=_physical_names(bloom_cols, cur),
                        m=bloom_bits, k=bloom_hashes,
                        schema_json=stage_schema,
                    )
                    if bloom_cols and written
                    else {}
                )
                validated_base = cur
            # REPLACE semantics: replaced entries point at the stage
            # alone (or vanish when the batch holds no rows for them);
            # everything else carries forward. Stats/blooms follow the
            # same replace-don't-merge rule.
            new_parts = {
                e: v
                for e, v in cur["partitions"].items()
                if e not in replaced
            }
            for e in written:
                new_parts[e] = stage
            new_stats = {
                e: s for e, s in cur.get("stats", {}).items() if e in new_parts
            }
            for e in replaced:
                new_stats.pop(e, None)
            if stats_cols:
                new_stats.update(staged_stats)
            new_bloom = {
                e: b
                for e, b in cur.get("bloom", {}).items()
                if e in new_parts and e not in replaced
            }
            if bloom_cols:
                new_bloom.update(staged_blooms)
            manifest = {
                "version": cur["version"] + 1,
                "dir": stage,
                "partition_col": partition_col,
                "partitions": new_parts,
                "batch_ids": [batch_id] if batch_id is not None else [],
                "op": "overwrite",
            }
            if new_stats:
                manifest["stats"] = new_stats
            if new_bloom:
                manifest["bloom"] = new_bloom
            if cur.get("constraints"):
                manifest["constraints"] = cur["constraints"]
            _carry_column_map(manifest, cur)
            if cur.get("dv"):
                manifest["dv"] = cur["dv"]
                manifest["dv_key"] = cur["dv_key"]
            _note_dir_schemas(
                manifest, cur, {stage: stage_schema if written else None}
            )
            if _publish(
                table_dir, manifest, stage_path, keep_stage_on_conflict=True
            ):
                stage_path = None
                return
        raise RuntimeError(
            f"commit conflict persisted for {max_retries} retries on "
            f"{table_dir}"
        )
    finally:
        if stage_path is not None:
            shutil.rmtree(stage_path, ignore_errors=True)


def land_stream_to_partitioned_table(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    partition_col: str,
    stats_cols: list[str] | None = None,
    trigger_available_now: bool = True,
    audit=None,
    bloom_cols: list[str] | None = None,
) -> StreamingQuery:
    """Land a stream into a partition-mapped committed table via
    foreachBatch appends — the streaming half of the lakehouse write
    path: each micro-batch is one `append_partition_transaction`
    (O(batch) cost, stats merged for data skipping, batch-id idempotence
    so a replay between write and checkpoint commit no-ops), and readers
    see exactly the committed batches at the versions they committed.
    Compaction (`compact_partition_table`) and erasure
    (`apply_erasure_rewrite`) run as ordinary transactions on the same
    table — one commit model across the stream/maintenance boundary.
    ``audit`` applies write-audit-publish to every micro-batch: a batch
    the audit rejects is never published and fails the stream loudly
    (no silent data loss; the operator decides whether to fix and
    restart — the checkpoint has not advanced past the bad batch).
    ``bloom_cols`` builds per-partition Bloom bitmaps per micro-batch
    (OR-merged across batches in the manifest) so equality skipping
    works on the streamed table too."""

    def land(batch_df: DataFrame, bid: int) -> None:
        append_partition_transaction(
            batch_df.sparkSession,
            table_dir,
            partition_col,
            batch_df,
            stats_cols=stats_cols,
            batch_id=bid,
            audit=audit,
            bloom_cols=bloom_cols,
        )

    writer = df.writeStream.foreachBatch(land).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_ZORDER_BITS = 16  # per-dimension resolution of the clustering key


def _zorder_sort_expr(cols: list[str], bounds: dict) -> "F.Column":
    """The multi-column clustering key for ``cluster_by`` compaction —
    Delta OPTIMIZE ZORDER BY's layout: scale each column MONOTONELY
    into [0, 2^bits) from its actual min/max (a modulo would destroy
    the range locality the clustering exists to create), then
    interleave the bits. Sorting by the interleaved key gives every
    clustered column simultaneously-tight row-group min/max, so a
    range scan on ANY of them prunes row groups — where a single-
    column sort serves only its own column."""
    n = len(cols)
    # total interleaved width must stay below the BIGINT sign bit: bit
    # 63 would flip the sort order and >=64 wraps mod 64 in Java shift
    # semantics, silently destroying the clustering (r10 review #6) —
    # so per-dimension resolution shrinks as columns are added
    bits = min(_ZORDER_BITS, 63 // n)
    scaled = []
    for c in cols:
        lo, hi = bounds[c]
        span = max(float(hi) - float(lo), 1.0)
        scaled.append(
            f"CAST((CAST({c} AS DOUBLE) - {float(lo)!r}) * "
            f"{float((1 << bits) - 1)!r} / {span!r} AS BIGINT)"
        )
    terms = [
        f"((({s}) >> {i} & 1) << {i * n + j})"
        for j, s in enumerate(scaled)
        for i in range(bits)
    ]
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def compact_partition_table(
    spark: SparkSession,
    table_dir: str,
    max_files_per_partition: int = 4,
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = None,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> list[str]:
    """OPTIMIZE as a commit: rewrite fragmented partitions of a
    partition-mapped committed table into one file each, published as a
    normal transaction — readers never see a half-compacted state, the
    pre-compaction version stays readable (snapshot history), and a
    crash mid-compaction costs only an unreferenced stage. Returns the
    compacted partition entries (empty = nothing fragmented).

    Fragmentation is measured from the manifest's own mapping (a
    driver-side file listing per current partition dir — no data read);
    the rewrite repartitions by the partition column so each value lands
    in exactly one task → one output file. Stats columns recorded in the
    current manifest are recomputed for the rewritten partitions, so
    data skipping keeps working across compactions. This is the
    maintenance half of a table format's write path (Delta OPTIMIZE /
    Iceberg rewrite_data_files) on the same commit protocol as every
    other mutation here.

    ``sort_within`` orders rows inside each rewritten partition (pass a
    Z-order key — queries/pipeline.py `zorder_key` — or the hot filter
    column): parquet row-group min/max become tight, so after manifest
    stats prune PARTITIONS, the scan's own predicate pushdown prunes
    ROW GROUPS — the two-level skipping a clustered table format gives
    (Delta OPTIMIZE ZORDER BY).

    ``max_records_per_file`` bounds rewritten file size (Delta OPTIMIZE's
    target-file-size): a partition bigger than one sane file must land as
    several, and combined with ``sort_within`` each file covers a tight
    DISJOINT key slice — a range scan then opens only the files whose
    footer stats overlap it. Note a partition compacted into more than
    ``max_files_per_partition`` files still counts as fragmented to a
    later compaction call; pick the two knobs together.

    ``cluster_by=[c1, c2, ...]`` (r10, VERDICT r09 stretch #7 —
    mutually exclusive with ``sort_within``) is Delta OPTIMIZE ZORDER
    BY: rows sort by the Morton interleave of the named NUMERIC
    columns, scaled monotonely from their actual bounds (one tiny
    1-row job over the fragmented partitions), so row-group min/max
    are simultaneously tight on EVERY clustered column — a range scan
    on any one of them prunes row groups, pinned from executed-plan
    scan metrics in tests/test_streaming_sink.py."""
    if cluster_by and sort_within:
        # validate argument combinations BEFORE the nothing-fragmented
        # early exit — an invalid call must raise regardless of the
        # table's current file counts
        raise ValueError("pass sort_within or cluster_by, not both")
    cur = current_commit(table_dir)
    if "partitions" not in cur:
        raise ValueError(
            f"{table_dir} is not partition-mapped; compact_parquet handles "
            "single-dir layouts"
        )
    pcol = cur["partition_col"]
    frag = []
    for entry, dirs in cur["partitions"].items():
        n_files = 0
        for dirname in _entry_dirs(dirs):
            d = os.path.join(table_dir, dirname, entry)
            n_files += sum(
                1 for f in os.listdir(d)
                if f.endswith(".parquet") or f.startswith("part-")
            )
        if n_files > max_files_per_partition:
            frag.append(entry)
    if not frag:
        return []
    values = [e.split("=", 1)[1] for e in frag]
    # skipping metadata to (re)write: explicit arguments win — after a
    # merge/append EXTENDED every entry, the manifest records no stats
    # or blooms at all, so deriving from it alone could never
    # re-establish skipping; passing the columns here is Delta's
    # "configure the bloom index on OPTIMIZE" knob — otherwise inherit
    # whatever the current manifest still records
    stats_cols = stats_cols or sorted(
        {c for s in cur.get("stats", {}).values() for c in s["cols"]}
    ) or None
    # recompute blooms for rewritten entries so equality skipping keeps
    # working across compactions; spec (m, k) inherited from the table
    blo = cur.get("bloom", {})
    bloom_cols = bloom_cols or sorted({c for e in blo.values() for c in e}) or None
    bloom_spec = next((s for e in blo.values() for s in e.values()), None)

    def rewrite(base: DataFrame) -> DataFrame:
        out = base.filter(F.col(pcol).isin(values)).repartition(F.col(pcol))
        if cluster_by:
            # bounds for the monotone scaling: one 1-row job over the
            # fragmented partitions (the sanctioned scalar-bounds shape)
            b = out.agg(
                *[F.min(c).alias(f"_lo_{c}") for c in cluster_by],
                *[F.max(c).alias(f"_hi_{c}") for c in cluster_by],
            ).collect()[0]
            bounds = {
                c: (b[f"_lo_{c}"] or 0, b[f"_hi_{c}"] or 0)
                for c in cluster_by
            }
            # sort by the EXPRESSION (pcol first — the file writer
            # requires partition-column-led ordering or inserts its own
            # non-stable sort): a materialized-then-dropped key column
            # would invalidate the outputOrdering the writer checks
            return out.sortWithinPartitions(
                F.col(pcol), _zorder_sort_expr(cluster_by, bounds)
            )
        if sort_within:
            # lead with the partition column: the file writer requires
            # its input ordered by the partition columns and would
            # otherwise insert its own (non-stable) sort, destroying the
            # clustering this exists to produce
            out = out.sortWithinPartitions(pcol, *sort_within)
        return out

    committed_partition_transaction(
        spark, table_dir, pcol, rewrite, affected=values,
        stats_cols=stats_cols, max_records_per_file=max_records_per_file,
        bloom_cols=bloom_cols,
        bloom_bits=bloom_spec["m"] if bloom_spec else _BLOOM_BITS,
        bloom_hashes=bloom_spec["k"] if bloom_spec else _BLOOM_HASHES,
        # compaction rewrites only CURRENT-layout entries from
        # current-layout rows, so unmigrated legacy layouts are safe to
        # leave untouched
        allow_legacy=True,
        # a compaction restates rows byte-for-value: tag the commit so
        # change feeds skip it (Delta OPTIMIZE's dataChange=false)
        data_change=False,
    )
    return sorted(frag)


def _manifest_dirs(m: dict) -> set[str]:
    """Every data dir a manifest references: its own stage, MOR
    generation list, partition map, any legacy-layout partition maps
    (partition evolution), and key-tombstone dirs — the reference set
    vacuum must respect."""
    out = {m["dir"]} if "dir" in m else set()
    out.update(m.get("dirs", []))
    out.update(m.get("dv", []))
    if m.get("cdc"):
        out.add(m["cdc"])  # the merge's change-data sidecar
    for v in m.get("partitions", {}).values():
        out.update(_entry_dirs(v))
    for lay in m.get("legacy_layouts", []):
        for v in lay.get("partitions", {}).values():
            out.update(_entry_dirs(v))
    return out


def tombstone_keys(
    spark: SparkSession,
    table_dir: str,
    key_col: str | list[str],
    keys_df: DataFrame,
    batch_id: int | None = None,
    max_retries: int = 10,
) -> None:
    """MERGE-ON-READ DELETE for a partition-mapped table — the deletion-
    vector trade: instead of rewriting every affected partition (the
    copy-on-write `apply_erasure_rewrite`), commit the DELETED KEYS as a
    tombstone file and let reads anti-join them out. Write cost is
    O(deleted keys) — at 100 TB a GDPR request touches kilobytes, not
    partitions — and reads pay one broadcast anti-join until
    `materialize_tombstones` rewrites the survivors and clears the list.

    Semantics are KEY tombstones (GDPR shape), not row positions: every
    row of a tombstoned key is hidden from every read — including rows
    APPENDED LATER — until a materialize clears the tombstones. Earlier
    snapshots still show the pre-delete state (their manifests carry no
    tombstone). The untyped change feed does not emit delete events;
    `read_table_changes_typed` reconstructs them (the prior version's
    rows matching the commit's newly-added keys, as ``delete`` images).

    ``key_col`` may be a list for a COMPOSITE natural key (VERDICT r10
    #2): the dv file then carries key TUPLES and every read anti-joins
    on all columns."""
    os.makedirs(table_dir, exist_ok=True)
    kcols = [key_col] if isinstance(key_col, str) else list(key_col)
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        if "dv_key" in cur and _dv_keys(cur) != kcols:
            raise ValueError(
                f"{table_dir} tombstones key {cur['dv_key']!r}; "
                f"delete supplied {key_col!r}"
            )
        cmap = _column_map(cur)
        bad = [
            k for k in kcols
            if k in cmap or k in set(cmap.values())
            or k in _dropped_physical(cur)
        ]
        if bad:
            # the dv files and the read-side anti-join address the key
            # by PHYSICAL name; a renamed/dropped key column would
            # silently hide nothing (or the wrong rows)
            raise ValueError(
                f"key column(s) {bad!r} are renamed or dropped in "
                f"{table_dir}; tombstone on the current physical names "
                "or rewrite the table"
            )
        if batch_id is not None and batch_id in committed_batch_ids(table_dir):
            return
        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        # NULL key components are dropped, not recorded: the read-side
        # anti-join on NULL matches nothing (SQL equality), so a NULL
        # tombstone hides no row — recording it would only poison the
        # dv key files for sorted-set consumers (ADVICE r10)
        not_null = F.lit(True)
        for k in kcols:
            not_null = not_null & F.col(k).isNotNull()
        dvf = keys_df.select(*kcols).filter(not_null).distinct()
        dvf.write.mode("overwrite").parquet(stage_path)
        manifest = {
            k: cur[k]
            for k in (
                "partition_col", "partitions", "stats", "bloom",
                "constraints", "legacy_layouts",
                "column_map", "dropped_columns",
            )
            if k in cur
        }
        manifest["version"] = cur["version"] + 1
        manifest["dir"] = stage
        manifest["dv"] = cur.get("dv", []) + [stage]
        manifest["dv_key"] = _dv_key_field(kcols)
        manifest["batch_ids"] = [batch_id] if batch_id is not None else []
        manifest["op"] = "delete"
        _note_dir_schemas(
            manifest, cur, {stage: _file_schema_json(dvf.schema)}
        )
        if _publish(table_dir, manifest, stage_path):
            return
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


_SCHEMA_MAP_KEYS = ("column_map", "dropped_columns")


def _map_meta(manifest: dict) -> tuple:
    """The manifest's column-mapping metadata as one comparable tuple —
    THE definition of "the map changed" every consumer (batch feeds,
    the stream admission in table_source.py) must share; adding a key
    to _SCHEMA_MAP_KEYS updates them all at once (r13 review #2)."""
    return tuple(manifest.get(k) for k in _SCHEMA_MAP_KEYS)


def _is_materialize(by_v: dict, m: dict) -> bool:
    """True when ``m`` is a `materialize_column_mapping` commit: a
    ``data_change: false`` rewrite whose mapping metadata differs from
    its predecessor's (plain compactions carry the map unchanged). The
    nearest retained earlier manifest stands in for a vacuumed one."""
    if not (m.get("op") == "rewrite" and m.get("data_change") is False):
        return False
    earlier = [k for k in by_v if k < m["version"]]
    prev = by_v[max(earlier)] if earlier else {}
    return _map_meta(m) != _map_meta(prev)


def _carry_column_map(manifest: dict, cur: dict) -> None:
    """Carry the column-mapping metadata (logical→physical rename map +
    dropped physical names) forward onto a new manifest — every commit
    that doesn't deliberately change the mapping must preserve it, or a
    compaction/append would silently un-rename the table."""
    for k in _SCHEMA_MAP_KEYS:
        if cur.get(k):
            manifest[k] = cur[k]


def _check_map_stable(
    by_v: dict, m: dict, table_dir: str, from_version: int
) -> None:
    """A ``data_change: false`` rewrite that CHANGED the column-mapping
    metadata is `materialize_column_mapping`: it re-based the files'
    PHYSICAL names, so frames before and after it do not share a
    physical schema and one end-of-range projection cannot serve both.
    A feed whose range spans it must raise (Delta CDF's incompatible-
    schema-change error) rather than emit a silently mixed frame where
    pre-materialize rows read NULL under the new names (r12 review #1).
    Plain compactions (map unchanged) pass; the nearest retained
    earlier manifest stands in for a vacuumed v-1."""
    if not (m.get("op") == "rewrite" and m.get("data_change") is False):
        return
    v = m["version"]
    if from_version >= v - 1:
        # the materialize is the range's first commit and emits nothing
        # itself: no pre-materialize frame can mix in, so a cursor
        # consumer sitting just below it advances normally instead of
        # wedging (r12 review sweep 2 #3)
        return
    if _is_materialize(by_v, m):
        raise ValueError(
            f"commit {v} of {table_dir} materialized a column "
            "mapping (physical rename); a change feed cannot span "
            f"it — read up to version {v - 1} and from {v} "
            "separately"
        )


def _column_map(manifest: dict) -> dict:
    """``{logical: physical}`` for renamed columns (identity entries
    never stored); ``{}`` when the table has no column mapping."""
    return manifest.get("column_map", {}) or {}


def _dropped_physical(manifest: dict) -> set:
    """PHYSICAL names of dropped columns — their data stays in the
    files forever (drop is metadata-only), reads never project them."""
    return set(manifest.get("dropped_columns", []) or [])


def _to_logical(df: DataFrame | None, manifest: dict) -> DataFrame | None:
    """Project a physical-schema read to the manifest's LOGICAL view:
    renamed columns alias physical→logical, dropped physical columns
    disappear, unmapped columns (including feed metadata columns) pass
    through. A no-op (same object) for unmapped tables."""
    cmap = _column_map(manifest)
    dropped = _dropped_physical(manifest)
    if df is None or (not cmap and not dropped):
        return df
    inv = {v: k for k, v in cmap.items()}
    cols = []
    for c in df.columns:
        if c in dropped:
            continue
        cols.append(F.col(c).alias(inv[c]) if c in inv else F.col(c))
    return df.select(*cols)


def _to_physical_batch(df: DataFrame, manifest: dict) -> DataFrame:
    """Translate an incoming batch from LOGICAL names to the table's
    PHYSICAL names before staging — and reject writes that would
    corrupt the mapping: a column carrying a renamed column's OLD name
    (the caller missed the rename), or one colliding with a dropped
    column's physical data (re-adding a dropped name needs id-based
    mapping; rejected — disclosed boundary)."""
    cmap = _column_map(manifest)
    dropped = _dropped_physical(manifest)
    if not cmap and not dropped:
        return df
    inv = {v: k for k, v in cmap.items()}
    out = []
    for c in df.columns:
        if c in dropped:
            raise ValueError(
                f"column {c!r} was dropped from this table (metadata-"
                "only); its physical data still exists, so re-adding "
                "the name would resurrect it — pick a different name"
            )
        if c in inv and inv[c] != c:
            raise ValueError(
                f"column {c!r} was renamed to {inv[c]!r}; write with "
                "the current name"
            )
        out.append(F.col(c).alias(cmap[c]) if c in cmap else F.col(c))
    return df.select(*out)


def _physical_names(names, manifest: dict):
    """Translate caller-facing LOGICAL column names (prune specs,
    stats_cols, bloom_cols) to the PHYSICAL names recorded in files,
    stats, and bloom bitmaps. Accepts a list (returns a list) or a
    dict keyed by column (returns a re-keyed dict); None passes
    through."""
    cmap = _column_map(manifest)
    if names is None or not cmap:
        return names
    if isinstance(names, dict):
        return {cmap.get(k, k): v for k, v in names.items()}
    return [cmap.get(c, c) for c in names]


def _dv_keys(manifest: dict) -> list[str]:
    """The manifest's tombstone key COLUMNS as a list — ``dv_key`` is a
    plain string for single-column keys (the pre-r11 format, kept for
    every existing manifest) and a list for composite natural keys
    (VERDICT r10 #2, e.g. the reference's (fault_system, nshm_id),
    schema.sql:12,47)."""
    k = manifest.get("dv_key")
    if k is None:
        return []
    return [k] if isinstance(k, str) else list(k)


def _dv_key_field(keys: list[str]):
    """Canonical manifest form: a bare string for single-column keys
    (backward-compatible), the list for composite keys."""
    return keys[0] if len(keys) == 1 else list(keys)


def _carry_stats_blooms(
    cur: dict,
    written: set[str],
    new_parts: dict,
    extend_vals: set,
    stage_path: str,
    stats_cols: list[str] | None,
) -> tuple[dict, dict]:
    """Stats/bloom bookkeeping shared by the DML writers (MERGE and
    UPDATE — r11 review #3 extracted it so the invariant cannot
    diverge): carried entries keep theirs; rewritten entries recompute
    stats from the staged footers and drop blooms; an entry that
    EXTENDED an existing mapping drops both (they no longer cover the
    new generation — stat-/bloom-less is never pruned, so safe;
    compaction re-establishes them); a brand-NEW entry's stage IS its
    full content, so it records stats."""
    new_stats = {
        e: st
        for e, st in cur.get("stats", {}).items()
        if e in new_parts and e not in written
    }
    if stats_cols and written:
        # staged footers carry PHYSICAL names (column mapping, r12)
        staged_stats = _collect_stage_stats(
            stage_path, written, _physical_names(stats_cols, cur)
        )
        for e in written:
            v = e.split("=", 1)[1]
            if v in extend_vals and e in cur["partitions"]:
                continue
            if e in staged_stats:
                new_stats[e] = staged_stats[e]
    new_bloom = {
        e: bm
        for e, bm in cur.get("bloom", {}).items()
        if e in new_parts and e not in written
    }
    return new_stats, new_bloom


def _cdc_image_parts(tcols: list[str], ttypes: dict, have: set):
    """(pre_fields, cur_fields, img) for the DML writers' CDC sidecar:
    pre-images read the ``_pre`` struct (evolved columns pad NULL),
    post-images read the decision frame's final values, ``img`` wraps
    either with its ``_change_type`` tag."""
    pre_fields = [
        (
            F.col(f"_pre.{c}").cast(ttypes[c])
            if c in have
            else F.lit(None).cast(ttypes[c])
        ).alias(c)
        for c in tcols
    ]
    cur_fields = [F.col(c).cast(ttypes[c]).alias(c) for c in tcols]

    def img(fields, ct: str):
        return F.struct(*fields, F.lit(ct).alias("_change_type"))

    return pre_fields, cur_fields, img


def _apply_tombstones(
    spark: SparkSession, table_dir: str, manifest: dict, df: DataFrame | None
) -> DataFrame | None:
    """Anti-join a read against the manifest's tombstoned keys (single
    or composite — the join is on every key column). The key set is
    deleted-rows-sized, so the anti-join broadcasts — the read-side
    half of the deletion-vector trade. NULL key components never match
    (SQL equality), and the write paths keep NULLs out of dv files."""
    dvs = manifest.get("dv", [])
    if not dvs or df is None:
        return df
    keys = _read_parquet_fast(
        spark,
        *[os.path.join(table_dir, d) for d in dvs],
        schema_json=_dirs_schema(manifest, dvs),
    ).distinct()
    return df.join(F.broadcast(keys), on=_dv_keys(manifest), how="left_anti")


def materialize_tombstones(
    spark: SparkSession, table_dir: str, stats_cols: list[str] | None = None
) -> int | None:
    """Fold the tombstones in: rewrite every partition with the deleted
    keys removed and CLEAR the tombstone list — the deferred rewrite
    `tombstone_keys` lets you postpone (Delta's PURGE). One commit; the
    pre-materialize versions keep their tombstoned view. Returns the new
    version, or None when there was nothing to materialize."""
    cur = current_commit(table_dir)
    if not cur.get("dv"):
        return None
    committed_partition_transaction(
        spark,
        table_dir,
        cur["partition_col"],
        # Re-read the head INSIDE compute: the transaction retries
        # against new heads, and a tombstone committed concurrently
        # must be applied by the rewrite that is about to CLEAR the dv
        # list (_drop_dv) — anti-joining the entry snapshot's dv would
        # lose it. If compute observes a newer head than the retry's
        # base, the CAS fails and the whole transaction re-runs, so
        # the pair stays consistent.
        lambda base: _apply_tombstones(
            spark, table_dir, current_commit(table_dir), base
        ),
        affected=None,
        stats_cols=stats_cols,
        _drop_dv=True,
        # the VISIBLE state is unchanged (hidden rows become physically
        # absent): change feeds skip the commit (dataChange=false)
        data_change=False,
    )
    return current_commit(table_dir)["version"]


def evolve_partition_column(
    spark: SparkSession, table_dir: str, new_partition_col: str
) -> int:
    """PARTITION EVOLUTION (Iceberg's headline spec change): switch the
    table's partition column for all FUTURE writes without rewriting a
    byte of existing data. The current layout is demoted to a
    ``legacy_layouts`` entry (its partition map, stats, and pruning keep
    working), the new layout starts empty, and reads union every layout
    — rows from a legacy layout read the new partition column from
    their DATA columns when present, else NULL (Iceberg's void
    transform for pre-evolution files). Appends land in the new layout;
    `migrate_legacy_layouts` rewrites old data into the current spec
    when (if ever) the rewrite cost is worth paying. Returns the new
    version. Metadata-only commit: the change feed emits nothing for
    it."""
    for _ in range(10):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        if cur["partition_col"] == new_partition_col:
            return cur["version"]  # already that spec: no-op
        cmap = _column_map(cur)
        if (
            new_partition_col in cmap
            or new_partition_col in set(cmap.values())
            or new_partition_col in _dropped_physical(cur)
        ):
            # appends translate batches to PHYSICAL names before
            # partitionBy, so a renamed/dropped partition column would
            # brick every later write (r12 review #4)
            raise ValueError(
                f"{new_partition_col!r} is renamed or dropped in "
                f"{table_dir}; materialize_column_mapping first"
            )
        legacy = list(cur.get("legacy_layouts", []))
        old = {
            "partition_col": cur["partition_col"],
            "partitions": cur["partitions"],
        }
        if cur.get("stats"):
            old["stats"] = cur["stats"]
        if cur.get("bloom"):
            old["bloom"] = cur["bloom"]
        legacy.append(old)
        stage = f"data-{uuid.uuid4().hex}"
        os.makedirs(os.path.join(table_dir, stage), exist_ok=True)
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "partition_col": new_partition_col,
            "partitions": {},
            "legacy_layouts": legacy,
            "batch_ids": [],
            "op": "evolve",
        }
        if cur.get("constraints"):
            manifest["constraints"] = cur["constraints"]
        _carry_column_map(manifest, cur)
        if cur.get("dv"):
            # outstanding tombstones survive the spec change — dropping
            # them here would resurrect deleted rows on the next read
            manifest["dv"] = cur["dv"]
            manifest["dv_key"] = cur["dv_key"]
        _note_dir_schemas(manifest, cur)
        if _publish(table_dir, manifest, os.path.join(table_dir, stage)):
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def _logical_columns(spark: SparkSession, cur: dict, table_dir: str) -> list:
    """The table's current LOGICAL column names — a plan resolve (zero
    jobs) over the partition map, projected through the column map."""
    full = _to_logical(_read_partition_map(spark, table_dir, cur), cur)
    return list(full.columns) if full is not None else []


def _check_mappable(cur: dict, col: str, action: str) -> None:
    """Shared RENAME/DROP safety gates: the partition column names the
    layout's directories, dv key columns name the tombstone files'
    schema, and CHECK constraints are SQL strings over the original
    names — each would silently decouple from a remapped column, so
    all three refuse (Delta's own column-mapping restrictions)."""
    if col == cur.get("partition_col"):
        raise ValueError(
            f"cannot {action} partition column {col!r}; its value IS "
            "the layout's directory names — evolve the partition spec "
            "instead"
        )
    # dv files carry PHYSICAL key names (tombstone_keys enforces
    # unmapped keys; a mapped MERGE writes its dv under the physical
    # names, r13) — compare through the map so renaming the LOGICAL
    # name of a dv-keyed column still refuses
    if _column_map(cur).get(col, col) in _dv_keys(cur):
        raise ValueError(
            f"cannot {action} tombstone key column {col!r}; the "
            "deletion-vector files carry it by name — "
            "materialize_tombstones first"
        )
    pat = re.compile(rf"\b{re.escape(col)}\b")
    for c in cur.get("constraints", []) or []:
        if pat.search(c):
            raise ValueError(
                f"cannot {action} {col!r}: CHECK constraint {c!r} "
                "references it; drop the constraint first"
            )


def rename_column(
    spark: SparkSession, table_dir: str, old: str, new: str,
    max_retries: int = 10,
) -> int:
    """RENAME COLUMN without rewriting a byte (Delta's column mapping,
    mode=name): a metadata-only ``op: "evolve"`` commit records the
    logical→physical name map in the manifest; every read projects
    through it (`read_keyed_table`, the change feeds), every
    partition-mapped append translates incoming LOGICAL names to the
    stable PHYSICAL names before staging — and an append still using
    the OLD name is rejected (it would silently fork the column).
    Time travel is automatic: each version's manifest carries ITS map,
    so a pre-rename version reads with the old name. The partition
    column, dv key columns, and constraint-referenced columns refuse
    (their consumers address physical artifacts by name). Returns the
    new version."""
    if not old or not new or old == new:
        raise ValueError(f"rename {old!r} -> {new!r} is not a rename")
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        logical = _logical_columns(spark, cur, table_dir)
        if old not in logical:
            raise ValueError(f"no column {old!r} in {table_dir}")
        if new in logical:
            raise ValueError(f"column {new!r} already exists")
        if new in _dropped_physical(cur):
            raise ValueError(
                f"{new!r} is a dropped column's physical name; reusing "
                "it would collide with its retained file data"
            )
        if new.startswith("_") or not re.fullmatch(r"[A-Za-z0-9_]+", new):
            # "_"-prefixed names collide with the feeds' metadata
            # columns (_commit_version/_change_type/_commit_timestamp);
            # dotted/quoted names break Column resolution in the
            # projection (r12 review #6)
            raise ValueError(
                f"{new!r} is not a valid logical column name (plain "
                "identifier, no leading underscore)"
            )
        _check_mappable(cur, old, "rename")
        cmap = dict(_column_map(cur))
        phys = cmap.pop(old, old)
        if new != phys and new in set(cmap.values()):
            # the new logical name would shadow ANOTHER column's stable
            # physical name — _to_physical_batch could then no longer
            # tell a legitimate append apart from a stale-name one
            # (r12 review #3)
            raise ValueError(
                f"{new!r} is another column's physical name; pick a "
                "name not in the physical schema"
            )
        if new != phys:
            cmap[new] = phys
        stage = f"data-{uuid.uuid4().hex}"
        os.makedirs(os.path.join(table_dir, stage), exist_ok=True)
        manifest = {
            k: cur[k]
            for k in (
                "partition_col", "partitions", "stats", "bloom",
                "constraints", "legacy_layouts", "dv", "dv_key",
                "dropped_columns", "dir_schemas",
            )
            if k in cur
        }
        manifest["version"] = cur["version"] + 1
        manifest["dir"] = stage
        manifest["batch_ids"] = []
        manifest["op"] = "evolve"
        if cmap:
            manifest["column_map"] = cmap
        if _publish(table_dir, manifest, os.path.join(table_dir, stage)):
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def drop_column(
    spark: SparkSession, table_dir: str, col: str, max_retries: int = 10,
) -> int:
    """DROP COLUMN without rewriting a byte (Delta column mapping): a
    metadata-only ``op: "evolve"`` commit records the column's PHYSICAL
    name as dropped — its data stays in every file, reads and feeds
    simply never project it, and time travel to a pre-drop version
    still sees it. Appends re-using the dropped name are rejected
    (name-based mapping cannot distinguish the new column from the
    retained data; id-based mapping would — disclosed boundary). Same
    refusals as `rename_column` for the partition/dv/constraint
    columns. Returns the new version."""
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        logical = _logical_columns(spark, cur, table_dir)
        if col not in logical:
            raise ValueError(f"no column {col!r} in {table_dir}")
        if len(logical) <= 2:
            raise ValueError(
                f"dropping {col!r} would leave only the partition "
                "column; a one-column table is almost certainly a "
                "mistake — rewrite instead"
            )
        _check_mappable(cur, col, "drop")
        cmap = dict(_column_map(cur))
        phys = cmap.pop(col, col)
        dropped = sorted(_dropped_physical(cur) | {phys})
        stage = f"data-{uuid.uuid4().hex}"
        os.makedirs(os.path.join(table_dir, stage), exist_ok=True)
        manifest = {
            k: cur[k]
            for k in (
                "partition_col", "partitions", "stats", "bloom",
                "constraints", "legacy_layouts", "dv", "dv_key",
                "dir_schemas",
            )
            if k in cur
        }
        manifest["version"] = cur["version"] + 1
        manifest["dir"] = stage
        manifest["batch_ids"] = []
        manifest["op"] = "evolve"
        manifest["dropped_columns"] = dropped
        if cmap:
            manifest["column_map"] = cmap
        if _publish(table_dir, manifest, os.path.join(table_dir, stage)):
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def materialize_column_mapping(
    spark: SparkSession, table_dir: str, stats_cols: list[str] | None = None
) -> int | None:
    """Fold the column mapping in: ONE rewrite commit restates every
    partition under the LOGICAL names (renamed columns physically
    renamed, dropped columns physically gone) and CLEARS the map — the
    deferred rewrite `rename_column`/`drop_column` let you postpone,
    and the escape hatch that re-enables MERGE/UPDATE/DELETE and the
    commitlog stream on a mapped table. The logical state is unchanged,
    so the commit is tagged ``data_change: false`` (feeds and additive
    consumers skip it, exactly like compaction). Earlier versions keep
    their own maps (time travel unaffected). ``stats_cols`` are the
    LOGICAL (= new physical) names. Returns the new version, or None
    when the table has no mapping."""
    cur = current_commit(table_dir)
    if not (_column_map(cur) or _dropped_physical(cur)):
        return None
    committed_partition_transaction(
        spark,
        table_dir,
        cur["partition_col"],
        # re-read the head INSIDE compute (same rationale as
        # materialize_tombstones): a rename committed concurrently must
        # be folded by the rewrite that is about to CLEAR the map — the
        # CAS retry re-runs compute against the new head
        lambda base: _to_logical(base, current_commit(table_dir)),
        affected=None,
        stats_cols=stats_cols,
        _drop_map=True,
        data_change=False,
    )
    return current_commit(table_dir)["version"]


def migrate_legacy_layouts(
    spark: SparkSession, table_dir: str, stats_cols: list[str] | None = None
) -> int | None:
    """Fold every legacy layout's data into the CURRENT partition spec —
    the deferred rewrite partition evolution lets you postpone. One
    commit: legacy rows are re-written partitioned by the current
    column (they must carry it as a data column), appended as
    generations of the current layout, and ``legacy_layouts`` drops
    from the manifest; old layout dirs stay as immutable history. After
    this, rewrite transactions (erasure, compaction of all data) see
    the whole table again. Returns the new version, or None when there
    was nothing to migrate."""
    prefix_err = "legacy rows lack the current partition column"
    for _ in range(10):
        cur = current_commit(table_dir)
        legacy = cur.get("legacy_layouts", [])
        if not legacy:
            return None
        pcol = cur["partition_col"]
        old_rows = None
        for lay in legacy:
            part = _read_partition_map(spark, table_dir, lay, None)
            if part is not None:
                old_rows = part if old_rows is None else old_rows.unionByName(
                    part, allowMissingColumns=True
                )
        if old_rows is None:
            new_parts = dict(cur["partitions"])
            written: set[str] = set()
            stage = f"data-{uuid.uuid4().hex}"
            os.makedirs(os.path.join(table_dir, stage), exist_ok=True)
        else:
            if pcol not in old_rows.columns:
                raise ValueError(f"{prefix_err}: {pcol}")
            stage = f"data-{uuid.uuid4().hex}"
            stage_path = os.path.join(table_dir, stage)
            old_rows.write.mode("overwrite").partitionBy(pcol).parquet(
                stage_path
            )
            prefix = f"{pcol}="
            written = {
                n for n in os.listdir(stage_path) if n.startswith(prefix)
            }
            _check_entry_values(written)
            new_parts = {e: v for e, v in cur["partitions"].items()}
            for e in written:
                new_parts[e] = (
                    _entry_dirs(new_parts[e]) + [stage]
                    if e in new_parts
                    else stage
                )
        # stats: migrated entries gained an unscanned generation unless
        # this call footer-scans them; same drop-or-merge contract as
        # append_partition_transaction
        new_stats = {
            e: s for e, s in cur.get("stats", {}).items() if e in new_parts
        }
        if not stats_cols:
            for e in written:
                new_stats.pop(e, None)
        elif written:
            staged = _collect_stage_stats(
                os.path.join(table_dir, stage), written, stats_cols
            )
            for e, add in staged.items():
                old_s = new_stats.get(e)
                if e in cur["partitions"] and e not in cur.get("stats", {}):
                    continue
                if old_s is None:
                    new_stats[e] = add
                else:
                    new_stats.pop(e, None)  # conservative: re-scan later
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "partition_col": pcol,
            "partitions": new_parts,
            "batch_ids": [],
            "op": "migrate",
        }
        if new_stats:
            manifest["stats"] = new_stats
        if cur.get("constraints"):
            manifest["constraints"] = cur["constraints"]
        _carry_column_map(manifest, cur)
        if cur.get("dv"):
            manifest["dv"] = cur["dv"]
            manifest["dv_key"] = cur["dv_key"]
        _note_dir_schemas(
            manifest,
            cur,
            {
                stage: _file_schema_json(old_rows.schema, drop=pcol)
                if old_rows is not None and written
                else None
            },
        )
        if _publish(table_dir, manifest, os.path.join(table_dir, stage)):
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def clone_table_shallow(
    src_dir: str, dest_dir: str, version: int | None = None
) -> int:
    """SHALLOW CLONE (Delta semantics): publish a new table whose
    manifest references the SOURCE's committed data dirs by absolute
    path — zero bytes copied, O(manifest) cost at any table size.
    The clone then lives its own life: appends/rewrites/constraints
    land in the clone's own dir and never touch the source, because
    every mutation writes new stage dirs and only ever carries the
    cloned entries forward by reference — the copy-on-write the
    immutable-data-dir invariant gives for free. Like Delta, a clone
    depends on the source's files EXISTING: a retention vacuum on the
    source can break clones made from its history (documented trade;
    deep-copy by reading+landing when that matters). Cloning a
    specific ``version`` time-travels the clone's starting point."""
    if version is None:
        src = current_commit(src_dir)  # O(1): hint + newest manifest
    else:
        src = next(
            (m for m in table_history(src_dir) if m["version"] == version),
            None,
        )
        if src is None:
            raise ValueError(f"version {version} not committed in {src_dir}")
    if src.get("version", 0) == 0:
        raise ValueError(f"{src_dir} has no commits to clone")
    if "partitions" not in src or "mor" in src or src.get("legacy_layouts"):
        raise ValueError(
            "shallow clone supports plain partition-mapped tables"
        )
    os.makedirs(dest_dir, exist_ok=True)
    # "empty" must mean NO commit history at all — the version-1 CAS
    # alone would succeed on an existing table whose early manifests
    # were vacuumed, silently splicing a foreign v1 into its history
    if current_commit(dest_dir)["version"] != 0 or _manifest_names(dest_dir):
        raise ValueError(f"clone target {dest_dir} is not an empty table")
    src_abs = os.path.abspath(src_dir)

    def _ref(d: str) -> str:
        return os.path.join(src_abs, d)

    manifest = {
        "version": 1,
        "dir": f"data-{uuid.uuid4().hex}",
        "partition_col": src["partition_col"],
        "partitions": {
            e: [_ref(d) for d in _entry_dirs(v)]
            for e, v in src["partitions"].items()
        },
        "batch_ids": [],
        "op": "clone",
    }
    for k in (
        "stats", "bloom", "constraints", "column_map", "dropped_columns",
    ):
        if src.get(k):
            manifest[k] = src[k]
    if src.get("dv"):
        manifest["dv"] = [_ref(d) for d in src["dv"]]
        manifest["dv_key"] = src["dv_key"]
    if src.get("dir_schemas"):
        # schemas follow their dirs — keyed by the clone's absolute refs
        manifest["dir_schemas"] = {
            _ref(d): s for d, s in src["dir_schemas"].items()
        }
    os.makedirs(os.path.join(dest_dir, manifest["dir"]), exist_ok=True)
    if not _publish(dest_dir, manifest, os.path.join(dest_dir, manifest["dir"])):
        raise RuntimeError(f"clone target {dest_dir} is not empty")
    return 1


def restore_table_version(table_dir: str, version: int) -> int:
    """RESTORE: re-publish an older committed version's state as a NEW
    commit (Delta RESTORE semantics — history moves forward, never
    rewrites). Zero data movement: the new manifest simply copies the
    target version's partition map / data dir, which stays valid because
    committed data dirs are immutable. Returns the new version number.
    Concurrency-safe via the same CAS: losing the race means someone
    else committed meanwhile — the restore retries against the new head
    so the restored state is always the caller's requested snapshot."""
    hist = table_history(table_dir)
    target = next((m for m in hist if m["version"] == version), None)
    if target is None:
        raise ValueError(f"version {version} not committed in {table_dir}")

    def _missing_dirs() -> list[str]:
        return [
            d
            for d in sorted(_manifest_dirs(target) - {"."})
            # os.path.join passes a clone's absolute refs through, so a
            # source-side vacuum is caught here too
            if not os.path.isdir(os.path.join(table_dir, d))
        ]

    # a retention vacuum may already have deleted the target's data —
    # refuse up front rather than committing a manifest to dead paths
    gone = _missing_dirs()
    if gone:
        raise ValueError(
            f"version {version} data was vacuumed ({gone[0]} missing); "
            "restore is impossible"
        )
    for _ in range(10):
        cur = current_commit(table_dir)
        manifest = {
            k: v
            for k, v in target.items()
            if k in (
                "dir", "partition_col", "partitions", "stats", "bloom",
                "constraints", "mor", "dirs", "legacy_layouts", "dv",
                "dv_key", "column_map", "dropped_columns", "dir_schemas",
            )
        }
        manifest["version"] = cur["version"] + 1
        manifest["batch_ids"] = []
        manifest["op"] = "restore"
        if try_commit(table_dir, manifest):
            # re-verify AFTER the commit: a vacuum running concurrently
            # could have deleted the target's dirs between our check
            # and the CAS (it cannot see this manifest yet). Raising is
            # loud and actionable — restore again to a live version —
            # where silence would leave a head pointing at dead data.
            gone = _missing_dirs()
            if gone:
                raise RuntimeError(
                    f"restore of version {version} raced a vacuum "
                    f"({gone[0]} deleted after commit); restore the "
                    "table to a live version"
                )
            _write_hint(table_dir, manifest)
            _maybe_checkpoint_ledger(table_dir, manifest["version"])
            return manifest["version"]
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def vacuum_versions(
    table_dir: str, keep_last: int, keep_from_version: int | None = None
) -> dict:
    """Retention: drop all but the last ``keep_last`` committed versions
    and delete the data dirs ONLY they referenced. Order matters for
    crash safety: manifests are unlinked FIRST (a crash mid-way leaves
    extra data dirs — garbage, re-vacuumable — never a manifest pointing
    at deleted data). Dirs shared with retained versions survive (append
    generations and carried-forward partitions are referenced by many
    manifests). Time travel to the dropped versions is gone — that is
    the retention trade, same as any table format's VACUUM. The batch-id
    ledger SURVIVES: dropped manifests' ids are rolled into a ledger
    checkpoint before unlinking, so replay idempotence is unaffected by
    retention.

    ``keep_from_version`` protects BY VERSION, not by count: every
    version >= it survives regardless of how many there are. This is
    the race-free pin a coordinating caller (catalog_vacuum) needs —
    the drop set is decided from ONE history read inside this call, so
    a commit landing between the caller's snapshot and this vacuum can
    only ADD protected (newer) versions, never shift a count-based
    window over the pinned one (ADVICE r13)."""
    hist = table_history(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cut = len(hist) - keep_last
    if keep_from_version is not None:
        cut = min(cut, sum(1 for m in hist if m["version"] < keep_from_version))
    drop, keep = hist[: max(cut, 0)], hist[max(cut, 0) :]
    if not drop:
        return {"versions": [], "dirs": []}

    def dirs_of(ms):
        out = set()
        for m in ms:
            out.update(_manifest_dirs(m))
        return out

    # Deletion is restricted to LOCAL data dirs (simple names directly
    # under this table): a shallow clone's manifest references the
    # SOURCE table's dirs by absolute path, and vacuuming the clone
    # must never reach through those references and destroy committed
    # data it does not own.
    doomed = {
        d
        for d in dirs_of(drop) - dirs_of(keep) - {"."}
        if not os.path.isabs(d) and os.sep not in d
    }
    log = os.path.join(table_dir, _COMMITS)
    # Preserve the batch-id ledger BEFORE unlinking: dropped manifests
    # carry delta ids that replay idempotence still needs. Roll them into
    # a checkpoint at the newest dropped version (ids-only — checkpoints
    # never reference data dirs, so nothing dangles), then retire older
    # checkpoints.
    dropped_max = drop[-1]["version"]
    _write_ledger_checkpoint(table_dir, dropped_max, committed_batch_ids(table_dir))
    for n in os.listdir(log):
        if n.endswith(".checkpoint.json") and int(n.split(".")[0]) < dropped_max:
            os.unlink(os.path.join(log, n))
    for m in drop:
        try:
            os.unlink(os.path.join(log, f"{m['version']:020d}.json"))
        except FileNotFoundError:
            pass
    for d in doomed:
        shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    return {"versions": [m["version"] for m in drop], "dirs": sorted(doomed)}


def vacuum_uncommitted(table_dir: str, grace_sec: float = 3600.0) -> list[str]:
    """Remove orphaned data dirs (staged by a writer that crashed before
    committing) that no manifest references and whose mtime is older than
    `grace_sec` — the grace window keeps an in-flight writer's fresh
    stage safe. Returns the removed names. Committed versions are never
    touched (older versions stay readable: snapshot reads).

    Contract: grace_sec must exceed the longest plausible writer stall
    between staging and committing. Writers refresh their stage's mtime
    immediately before the CAS and fail loudly (un-publishing their
    manifest) if the stage vanished anyway, so a too-short grace costs a
    failed transaction, never a manifest pointing at missing data."""
    log = os.path.join(table_dir, _COMMITS)
    referenced = set()
    try:
        for n in os.listdir(log):
            if _is_manifest(n):
                m = _read_json(os.path.join(log, n))
                if m is None:  # unlinked by a concurrent retention vacuum
                    continue
                referenced.update(_manifest_dirs(m))
    except FileNotFoundError:
        pass
    removed = []
    now = time.time()
    for n in os.listdir(table_dir):
        p = os.path.join(table_dir, n)
        if (
            (
                n.startswith("data-")
                or n.startswith("cdc-")
                # LEGACY decision-scan scratch dirs (pre-r14 writers
                # materialized merge/update/delete frames to parquet; a
                # SIGKILLed one leaks full-row copies incl. rows a GDPR
                # delete meant to erase — r12 review sweep 2 #4). r14
                # writers localCheckpoint instead (nothing on disk to
                # leak), but old leftovers must still sweep
                or n.startswith("scratch-")
            )
            and n not in referenced
            and os.path.isdir(p)
            and now - os.path.getmtime(p) > grace_sec
        ):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(n)
        elif (
            n.startswith("_hint-tmp-")
            and os.path.isfile(p)
            and now - os.path.getmtime(p) > grace_sec
        ):
            # a writer that crashed inside _write_hint between mkstemp
            # and os.replace leaves this orphan — same grace-window
            # sweep as the _commits/*.tmp case
            os.unlink(p)
            removed.append(n)
    # A writer that crashes between mkstemp and try_commit's finally
    # leaves an orphan *.tmp manifest in the log dir forever (ADVICE
    # r04); sweep those under the same grace window. A live writer's
    # tmp is younger than grace_sec, so this never races the CAS.
    if os.path.isdir(log):
        for n in os.listdir(log):
            p = os.path.join(log, n)
            if (
                n.endswith(".tmp")
                and os.path.isfile(p)
                and now - os.path.getmtime(p) > grace_sec
            ):
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass
                removed.append(os.path.join(_COMMITS, n))
    return removed


def table_history(table_dir: str) -> list[dict]:
    """All committed manifests, oldest first — the audit trail a real
    table format exposes as DESCRIBE HISTORY. Empty for legacy
    pointer-only tables (their history was overwritten in place)."""
    out = []
    for n in _manifest_names(table_dir):
        m = _read_json(os.path.join(table_dir, _COMMITS, n))
        if m is not None:  # dropped by a concurrent retention vacuum
            out.append(m)
    return out


def read_table_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    history: list[dict] | None = None,
) -> DataFrame | None:
    """CHANGE FEED over a partition-mapped committed table: the rows
    each commit in ``(from_version, to_version]`` ADDED, tagged with
    ``_commit_version`` — the Delta CDF / Iceberg incremental-read
    surface, and the input a downstream incremental job consumes
    instead of re-scanning the table ("give me everything since the
    version I last processed").

    Committed data dirs are immutable and version-stamped, so the feed
    is just the stage dirs of the requested commit range — O(changed
    data) read, zero reconstruction work. Append transactions contribute
    exactly their batch; rewrite transactions (compaction, erasure)
    contribute the rewritten partitions' new contents — the "upsert
    image" granularity. A RESTORE re-publishes an EARLIER version's
    stage dir without writing a row, so it contributes nothing (the
    re-published dir is recognized and skipped — emitting it would
    replay the whole restored table as "changes" and double-fold any
    additive consumer). Returns None when the range holds no commits
    with data."""
    out = None
    seen_dirs: set[str] = set()
    # the feed surfaces the END version's LOGICAL schema (Delta CDF
    # reads a range with the end schema): frames are physical, one
    # projection at the end maps them — rename is metadata-only, so
    # physical names are stable across the whole range; the one commit
    # that re-bases them (materialize_column_mapping) raises via
    # _check_map_stable below
    end_m: dict = {}
    # ``history`` lets a caller iterating many version ranges (the
    # incremental maintainer) pay the full commit-log scan ONCE instead
    # of once per range — O(V) metadata cost over a refresh, not O(V²)
    hist = history if history is not None else table_history(table_dir)
    by_v = {m["version"]: m for m in hist}
    for m in hist:
        v = m["version"]
        republished = m.get("dir") in seen_dirs
        if m.get("dir"):
            seen_dirs.add(m["dir"])
        if (to_version is None or v <= to_version) and v > end_m.get(
            "version", 0
        ):
            end_m = m
        if v <= from_version or (to_version is not None and v > to_version):
            continue
        if republished:
            continue  # metadata-only re-publish (RESTORE)
        if m.get("op") == "rewrite" and m.get("data_change") is False:
            # compaction / Z-order / tombstone materialization: provably
            # a restatement (Delta's dataChange=false) — emitting its
            # stage would replay unchanged rows as "changes". A
            # column-mapping materialize is the exception: it re-based
            # the physical names, so the range cannot span it.
            _check_map_stable(by_v, m, table_dir, from_version)
            continue
        if "partitions" not in m:
            raise ValueError(
                f"{table_dir} is not partition-mapped; read versions "
                "directly for single-dir tables"
            )
        stage = m["dir"]
        prefix = f"{m['partition_col']}="
        stage_abs = os.path.join(table_dir, stage)
        entries = (
            {n for n in os.listdir(stage_abs) if n.startswith(prefix)}
            if os.path.isdir(stage_abs)
            else set()
        )
        if not entries:
            continue  # metadata-only commit (e.g. RESTORE)
        part = _read_partition_map(
            spark,
            table_dir,
            {
                "partition_col": m["partition_col"],
                "partitions": {e: stage for e in sorted(entries)},
                # the commit's own recorded schemas serve its stage dir
                "dir_schemas": m.get("dir_schemas") or {},
            },
        ).withColumn("_commit_version", F.lit(v).cast("long"))
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return _to_logical(out, end_m)


def read_table_changes_typed(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    history: list[dict] | None = None,
) -> DataFrame | None:
    """TYPED change feed — `read_table_changes` with a ``_change_type``
    column (Delta CDF's full surface): per commit in
    ``(from_version, to_version]``,

    * ``append``     → the stage's rows as ``insert``;
    * ``overwrite`` / ``rewrite`` → upsert image PAIRS for exactly the
      entries whose mapping changed: the new content as ``insert`` and
      the PRIOR version's content of those entries as ``delete`` (an
      entry dropped by the commit emits deletes only). Delta-CDF
      parity note (ADVICE r09): a non-keyed rewrite emits
      insert/delete pairs, not update images — pairing pre/post per
      ROW needs a declared row key, which a partition-mapped
      (non-keyed) overwrite does not have. Consumers folding the feed
      key on their own id columns; a ``rewrite`` tagged
      ``data_change: false`` (compaction, Z-order, tombstone
      materialization — Delta's dataChange=false) provably restates
      rows and emits NOTHING;
    * ``delete`` (key tombstone) → the PRIOR version's rows matching
      the commit's newly-added keys as ``delete`` — the event stream
      `tombstone_keys` itself cannot provide (its docstring used to
      point consumers at raw key files);
    * ``delete`` (predicate — `delete_table`, r12) → the commit's
      ``cdc`` sidecar holds each deleted row's exact image (Delta's
      DELETE ``_change_data``), served directly; with
      ``change_data=False`` the commit falls back to the map-diff pair
      images below (a rewrite diff — surviving rows restate as
      ``insert``, prior contents as ``delete``), exactly like a
      pre-CDF Delta delete. The two flavors are routed by artifact:
      a new dv file means tombstone, a partition-map diff means
      predicate;
    * ``merge`` with a ``cdc`` sidecar (the default since r11 —
      Delta's _change_data files) → the EXACT row-level images the
      merge recorded at commit time: WHEN MATCHED updates as
      ``update_preimage``/``update_postimage`` PAIRS (keyed by the
      merge keys by construction), deletes as before-images, inserts
      as after-images, carried rows absent (VERDICT r10 #1 / the
      second half of ADVICE r09 #5). O(changed rows) read, zero
      reconstruction. A pre-r11 merge (or ``change_data=False``)
      falls back to the map-diff pairs: entries whose dir list merely
      GREW emit only the added generations as inserts, tombstoned
      keys emit delete images via the dv KEY diff, re-inserted keys
      reappear through the map diff;
    * ``set-constraints`` / ``evolve`` → metadata-only, no rows;
    * ``restore`` / ``clone`` / ``migrate`` / untagged → raise: their
      row images are not defined by one commit's files, and guessing
      would double-fold downstream consumers.

    Cost: insert images are the commit's own immutable stage and
    overwrite/rewrite delete images open only the touched entries'
    prior dirs — O(changed data). The tombstone branch's delete-image
    read resolves the prior VERSION and prunes it to partitions whose
    recorded stats can hold the deleted keys; without stats on the key
    column that one commit costs a prior-version scan (disclosed — the
    keys are arbitrary, so only stats can narrow it). Every image is
    filtered through ITS version's tombstones, so an already-hidden row
    never appears in an insert or re-deletes. Rows carry
    ``_commit_version``, ``_change_type``, and ``_commit_timestamp``
    (the manifest's publish wall-clock; NULL for pre-feature
    manifests) — Delta CDF's metadata columns."""
    hist = history if history is not None else table_history(table_dir)
    by_v = {m["version"]: m for m in hist}
    head = max(by_v) if by_v else 0
    hi = head if to_version is None else to_version
    out = None

    def _commit_ts(version: int):
        # Delta CDF's _commit_timestamp, from the manifest's publish
        # wall-clock (committed_at, recorded once at try_commit); NULL
        # for pre-feature manifests without one (ADVICE r09)
        ts = by_v.get(version, {}).get("committed_at")
        return (
            F.timestamp_seconds(F.lit(float(ts)))
            if ts is not None
            else F.lit(None).cast("timestamp")
        )

    def _entries_df(manifest_like: dict, dv_of: dict, version: int, ctype: str):
        # images are STATE diffs: rows a version's own tombstones hide
        # are not part of that state, so they never appear as images
        # (r9 review #1 — the function's own contract)
        nonlocal out
        if dv_of.get("dir_schemas"):
            # the synthetic map reads dirs referenced by `dv_of`'s real
            # manifest — its recorded schemas serve them (zero footer
            # reads on the reconstruction reads too)
            manifest_like.setdefault("dir_schemas", dv_of["dir_schemas"])
        part = _apply_tombstones(
            spark, table_dir, dv_of,
            _read_partition_map(spark, table_dir, manifest_like),
        )
        if part is None:
            return
        part = (
            part.withColumn("_commit_version", F.lit(version).cast("long"))
            .withColumn("_change_type", F.lit(ctype))
            .withColumn("_commit_timestamp", _commit_ts(version))
        )
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )

    for v in range(from_version + 1, hi + 1):
        m = by_v.get(v)
        if m is None:
            raise ValueError(
                f"commit {v} of {table_dir} was vacuumed; typed changes "
                "for it cannot be reconstructed"
            )
        op = m.get("op")
        if op in ("set-constraints", "evolve"):
            continue  # metadata-only commits move no rows
        if op not in (
            "append", "overwrite", "rewrite", "delete", "merge", "update"
        ):
            raise ValueError(
                f"commit {v} is {op!r} — its row images are not defined "
                "by a single commit's files; consume it via a recompute"
            )
        if op == "rewrite" and m.get("data_change") is False:
            # compaction / Z-order / tombstone materialization: the
            # commit provably restates rows (Delta's dataChange=false)
            # — no images, and no diff base needed. A column-mapping
            # materialize re-based the physical names, so a range
            # spanning it must raise instead (r12 review #1).
            _check_map_stable(by_v, m, table_dir, from_version)
            continue
        if op in ("merge", "update", "delete") and m.get("cdc"):
            # Delta's _change_data path: the merge/update/delete
            # recorded exact row-level images (update pre/post pairs,
            # deletes, inserts; carried rows absent) at commit time —
            # read them directly, no diff base, no reconstruction joins
            cdc = _read_parquet_fast(
                spark,
                os.path.join(table_dir, m["cdc"]),
                schema_json=_dir_schema(m, m["cdc"]),
            )
            cdc = cdc.withColumn(
                "_commit_version", F.lit(v).cast("long")
            ).withColumn("_commit_timestamp", _commit_ts(v))
            out = cdc if out is None else out.unionByName(
                cdc, allowMissingColumns=True
            )
            continue
        if (
            op in ("overwrite", "rewrite", "delete", "merge", "update")
            and v - 1 >= 1
            and v - 1 not in by_v
        ):
            # the DIFF BASE one below the range: defaulting it to an
            # empty table would emit the whole table as inserts and
            # re-emit every historical tombstone (r9 review #2). Only
            # these ops diff against v-1 — an append's inserts are its
            # own stage, so a vacuumed v-1 under a plain append is fine
            # (ADVICE r09: a from_version just below the retention
            # horizon must not fail when the range is all appends)
            raise ValueError(
                f"commit {v - 1} of {table_dir} (the diff base for "
                f"{v}) was vacuumed; typed changes cannot be "
                "reconstructed from this from_version"
            )
        prev = by_v.get(v - 1, {"partitions": {}}) if v > 1 else {
            "partitions": {}
        }
        if "partitions" not in m:
            raise ValueError(
                f"{table_dir} is not partition-mapped; read versions "
                "directly for single-dir tables"
            )
        pcol = m["partition_col"]
        # a "delete" commit is either a PREDICATE delete (delete_table
        # with change_data=False landing here — no new dv file, its
        # diff is the partition-map rewrite) or a KEY tombstone
        # (tombstone_keys — a new dv file, partitions untouched);
        # route on which artifact it produced
        new_dv = (
            [d for d in m.get("dv", []) if d not in prev.get("dv", [])]
            if op == "delete"
            else []
        )
        if op == "append":
            stage_abs = os.path.join(table_dir, m["dir"])
            entries = (
                {
                    n
                    for n in os.listdir(stage_abs)
                    if n.startswith(f"{pcol}=")
                }
                if os.path.isdir(stage_abs)
                else set()
            )
            if entries:
                _entries_df(
                    {
                        "partition_col": pcol,
                        "partitions": {e: m["dir"] for e in sorted(entries)},
                    },
                    m,
                    v,
                    "insert",
                )
        elif op in ("overwrite", "rewrite", "merge", "update") or (
            op == "delete" and not new_dv
        ):
            cur_p, prev_p = m["partitions"], prev.get("partitions", {})
            touched = {
                e for e in set(cur_p) | set(prev_p)
                if cur_p.get(e) != prev_p.get(e)
            }
            ins, dels, extended = {}, {}, {}
            for e in sorted(touched):
                cd = _entry_dirs(cur_p[e]) if e in cur_p else []
                pd_ = _entry_dirs(prev_p[e]) if e in prev_p else []
                if pd_ and cd[: len(pd_)] == pd_:
                    # pure generation EXTENSION (a merge insert): only
                    # the added dirs are new rows — emitting a full
                    # pair would re-state unchanged data. The PRIOR
                    # generations still join the dv delete-image base
                    # below (r11 review #1): an extension emits no pair
                    # deletes, so keys the same merge tombstoned there
                    # would otherwise lose their delete images.
                    ins[e] = cd[len(pd_):]
                    extended[e] = pd_
                else:
                    if e in cur_p:
                        ins[e] = cur_p[e]
                    if e in prev_p:
                        dels[e] = prev_p[e]
            if ins:
                _entries_df(
                    {"partition_col": pcol, "partitions": ins}, m, v, "insert"
                )
            if dels:
                _entries_df(
                    {"partition_col": pcol, "partitions": dels},
                    prev, v, "delete",
                )
            if op == "merge" and m.get("dv") != prev.get("dv"):
                # a merge's delete clauses may tombstone keys (and a
                # consolidation may CLEAR re-inserted ones — those rows
                # reappear via the map diff above). New hidden keys =
                # key-set difference, not dir-list difference: the
                # consolidated file holds old keys too.
                cur_keys = (
                    _read_parquet_fast(
                        spark,
                        *[os.path.join(table_dir, d) for d in m["dv"]],
                        schema_json=_dirs_schema(m, m["dv"]),
                    ).distinct()
                    if m.get("dv")
                    else None
                )
                if cur_keys is not None:
                    kcols = _dv_keys(m)
                    if prev.get("dv"):
                        prev_keys = _read_parquet_fast(
                            spark,
                            *[os.path.join(table_dir, d) for d in prev["dv"]],
                            schema_json=_dirs_schema(prev, prev["dv"]),
                        ).distinct()
                        added = cur_keys.join(
                            prev_keys, on=kcols, how="left_anti"
                        )
                    else:
                        added = cur_keys
                    lo_hi = added.agg(
                        *[
                            F.min(k).alias(f"_lo{i}")
                            for i, k in enumerate(kcols)
                        ],
                        *[
                            F.max(k).alias(f"_hi{i}")
                            for i, k in enumerate(kcols)
                        ],
                    ).collect()[0]
                    if lo_hi["_lo0"] is not None:  # empty set hides nothing
                        # delete images come from entries whose prior
                        # rows are NOT already re-stated as pair
                        # deletes: untouched entries, plus the PRIOR
                        # generations of pure EXTENSIONS (their pair
                        # images are insert-only — r11 review #1; a
                        # REWRITTEN entry's removed rows are in its
                        # pair deletes, so including it would
                        # double-delete keys whose rows span both,
                        # r10 review #2). Legacy layouts cannot exist
                        # under a merge commit (the write path refuses
                        # them), so the current-layout map is the
                        # whole prior state.
                        untouched = {
                            e: prev_p[e] for e in prev_p if e not in touched
                        }
                        untouched.update(extended)
                        sub = {
                            "partition_col": pcol,
                            "partitions": dict(
                                _stats_prune(
                                    {
                                        "partitions": untouched,
                                        "stats": prev.get("stats", {}),
                                    },
                                    {
                                        k: (lo_hi[f"_lo{i}"], lo_hi[f"_hi{i}"])
                                        for i, k in enumerate(kcols)
                                    },
                                )
                            ),
                            "dir_schemas": prev.get("dir_schemas") or {},
                        }
                        before = (
                            _apply_tombstones(
                                spark, table_dir, prev,
                                _read_partition_map(spark, table_dir, sub),
                            )
                            if sub["partitions"]
                            else None
                        )
                        if before is not None:
                            deleted = before.join(
                                F.broadcast(added), on=kcols, how="left_semi"
                            )
                            deleted = (
                                deleted.withColumn(
                                    "_commit_version", F.lit(v).cast("long")
                                )
                                .withColumn("_change_type", F.lit("delete"))
                                .withColumn("_commit_timestamp", _commit_ts(v))
                            )
                            out = (
                                deleted
                                if out is None
                                else out.unionByName(
                                    deleted, allowMissingColumns=True
                                )
                            )
        else:  # op == "delete" with a new dv file: key tombstone commit
            kcols = _dv_keys(m)
            keys = _read_parquet_fast(
                spark,
                *[os.path.join(table_dir, d) for d in new_dv],
                schema_json=_dirs_schema(m, new_dv),
            ).distinct()
            # narrow the prior-version read to partitions whose stats
            # can hold the deleted keys (the key file is O(deleted
            # keys), so its bounds are one tiny job — r9 review #5)
            lo_hi = keys.agg(
                *[F.min(k).alias(f"_lo{i}") for i, k in enumerate(kcols)],
                *[F.max(k).alias(f"_hi{i}") for i, k in enumerate(kcols)],
            ).collect()[0]
            prune = (
                {
                    k: (lo_hi[f"_lo{i}"], lo_hi[f"_hi{i}"])
                    for i, k in enumerate(kcols)
                }
                if lo_hi["_lo0"] is not None
                else None
            )
            before = read_keyed_table(
                spark, table_dir, version=v - 1, prune=prune,
                _logical=False,
            )
            if before is None:
                continue
            deleted = before.join(F.broadcast(keys), on=kcols, how="left_semi")
            deleted = (
                deleted.withColumn("_commit_version", F.lit(v).cast("long"))
                .withColumn("_change_type", F.lit("delete"))
                .withColumn("_commit_timestamp", _commit_ts(v))
            )
            out = deleted if out is None else out.unionByName(
                deleted, allowMissingColumns=True
            )
    # surface the END version's LOGICAL schema (Delta CDF reads a range
    # with the end schema): frames and sidecars are physical throughout,
    # and rename is metadata-only, so one final projection is coherent
    # for the whole range
    end_m = by_v.get(hi) or (by_v[max(by_v)] if by_v else {})
    return _to_logical(out, end_m)


def apply_typed_changes(feed: DataFrame, cols: list[str]) -> DataFrame:
    """CDC APPLY: fold a typed change feed into the replica state it
    encodes. Images are exact state diffs, so the head state equals
    (multiset of insert images) − (multiset of delete images) over the
    data columns: ONE hash aggregation on the row values, rows with a
    positive net count emitted that many times (an update nets 0 on
    its old image and +1 on its new; a delete-then-identical-reinsert
    nets +1; duplicate physical rows net their multiplicity). ``cols``
    is the replica's column set — the feed's metadata columns are
    dropped. Update images weigh like their pair halves:
    ``update_preimage`` −1 (the before state leaves), ``insert`` and
    ``update_postimage`` +1, ``delete`` −1.

    This is the batch proof that the feed ALONE reconstructs the
    table (`cdc_apply_typed` pins replica == head against the oracle);
    a consumer maintaining a replica incrementally folds each
    version's images into a keyed `merge_into_table` instead. Scale
    shape: one shuffle on the full row values — the same cost class as
    the dedup_exact fingerprint exchange."""
    w = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        feed.select(*cols, w.alias("_w"))
        .groupBy(*cols)
        .agg(F.sum("_w").alias("_net"))
        .filter(F.col("_net") > 0)
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_net"))))
        .drop("_net", "_i")
    )


def read_partition_counts(spark: SparkSession, table_dir: str) -> DataFrame:
    """Per-partition COUNT(*) answered from the MANIFEST — Delta's
    metadata-only count optimization: every footer-scanned entry
    carries its exact row count in stats (`n`), so the answer for
    those partitions is O(partitions) JSON already in memory, zero
    data files opened. Entries without stats fall back to scanning
    JUST those partitions; tombstoned or legacy-layout tables fall
    back to a full counted read (manifest counts don't see deletion
    vectors or other layouts — correctness before cleverness). The
    result schema is (partition_col string, n long) either way, so
    callers can't tell which path answered — only how fast."""
    cur = current_commit(table_dir)
    if cur["version"] == 0:
        raise ValueError(f"{table_dir} has no commits")
    if "partitions" not in cur or "mor" in cur:
        raise ValueError(
            f"{table_dir} is not a partition-mapped committed table"
        )
    pcol = cur["partition_col"]

    def scan_counts(df: DataFrame) -> DataFrame:
        return df.groupBy(pcol).agg(F.count(F.lit(1)).cast("long").alias("n"))

    if cur.get("dv") or cur.get("legacy_layouts"):
        full = read_keyed_table(spark, table_dir)
        if full is None:  # every partition dropped; dv/layouts remain
            return spark.createDataFrame([], f"{pcol} string, n long")
        return scan_counts(full)
    stats = cur.get("stats", {})
    counted = [
        (e.split("=", 1)[1], int(stats[e]["n"]))
        for e in cur["partitions"]
        if e in stats and stats[e].get("n") is not None
    ]
    missing = {
        e: d
        for e, d in cur["partitions"].items()
        if e not in stats or stats[e].get("n") is None
    }
    out = None
    if counted:
        out = spark.createDataFrame(counted, f"{pcol} string, n long")
    if missing:
        part = _read_partition_map(
            spark,
            table_dir,
            {
                "partition_col": pcol,
                "partitions": missing,
                "dir_schemas": cur.get("dir_schemas") or {},
            },
        )
        scanned = scan_counts(part)
        out = scanned if out is None else out.unionByName(scanned)
    if out is None:
        return spark.createDataFrame([], f"{pcol} string, n long")
    return out


def maintain_incremental_agg(
    spark: SparkSession, source_dir: str, dest_dir: str, agg, merge
) -> int:
    """Incrementally maintain a derived AGGREGATE table from a source
    table's change feed — the materialized-view half of a medallion
    pipeline (bronze facts → silver rollup) with NO source re-scan:
    each refresh reads only the commits the destination has not folded
    yet. ``agg(delta_df) -> DataFrame`` folds one commit's added rows
    to the aggregate grain; ``merge(base_or_None, delta_agg) ->
    DataFrame`` combines it into the running aggregate (additive
    measures: union + ONE hash re-agg). Each source commit becomes one
    destination commit stamped ``batch_id = source version``, so the
    cursor LIVES IN the destination's own commit ledger (its committed
    batch ids) — a replayed refresh, a crash between commits, or two
    concurrent maintainers all resolve to exactly-once application per
    source version, the same idempotence contract as the streaming
    sinks. Metadata-only source commits (RESTORE, partition evolution)
    contribute no rows and are skipped. Cost per refresh is O(changed
    rows) + O(aggregate table), never O(source) — the only sane shape
    when the source is 100 TB and the rollup is megabytes. Returns the
    number of source commits applied.

    SOUND FOR APPEND-ONLY SOURCES: the change feed surfaces rewrite
    commits (erasure, migration) as upsert images and deletes/restores
    as state changes with no add rows — an additive fold would
    double-count or silently miss them, so any such commit in the
    unfolded range RAISES (each manifest carries its ``op`` tag;
    recompute the aggregate instead, or keep the source append-only,
    which is what a landing zone is). The exception is a rewrite
    tagged ``data_change: false`` (compaction / Z-order — Delta's
    dataChange=false): a provable restatement, skipped, so table
    maintenance never breaks incremental refresh. A source commit
    vacuumed before it was folded also raises — its rows are
    unfoldable, so schedule maintenance inside the retention
    window."""
    applied = 0
    ordered = table_history(source_dir)
    hist = {m["version"]: m for m in ordered}
    head = current_commit(source_dir)["version"]
    done = committed_batch_ids(dest_dir) if os.path.isdir(dest_dir) else set()
    for v in range(1, head + 1):
        if v in done:
            continue
        m = hist.get(v)
        if m is None:
            raise ValueError(
                f"source commit {v} was vacuumed before it was folded; "
                "recompute the aggregate from the current table instead"
            )
        op = m.get("op")
        if op == "rewrite" and m.get("data_change") is False:
            continue  # compaction: restatement, nothing to fold
        # nearest RETAINED earlier manifest (same fallback as
        # _check_map_stable): v-1 may be folded-and-vacuumed, and a
        # stable carried map compared against a defaulted {} would
        # falsely read as a rename and wedge the maintainer forever
        # (r12 review sweep 3 #1)
        earlier = [k for k in hist if k < v]
        prev_m = hist[max(earlier)] if earlier else None
        if prev_m is not None and any(
            m.get(k) != prev_m.get(k) for k in _SCHEMA_MAP_KEYS
        ):
            # a RENAME/DROP COLUMN (or its materialize) changes the
            # LOGICAL names the per-version deltas surface — folding
            # across it would union old- and new-named measures as two
            # NULL-padded columns and silently diverge from a recompute
            # (r12 review sweep 2 #1). Folds resumed on a table whose
            # map is stable (even non-empty) stay sound.
            raise ValueError(
                f"source commit {v} renamed/dropped columns; additive "
                "incremental maintenance cannot span a schema rename — "
                "recompute the aggregate from the current table instead"
            )
        if op not in ("append", "set-constraints", "evolve"):
            # Refuse everything an additive fold cannot express: rewrites
            # double-count, deletes/restores change state without add
            # rows, a clone's base table hides behind an empty stage,
            # and an UNTAGGED commit (pre-op manifest) could be any of
            # those — raising beats silently wrong (re-land legacy
            # sources, or recompute).
            raise ValueError(
                f"source commit {v} is {op!r} — additive incremental "
                "maintenance is only sound over append-only history; "
                "recompute the aggregate from the current table instead"
            )
        delta = read_table_changes(
            spark, source_dir, v - 1, v, history=ordered
        )
        if delta is None:
            continue  # metadata-only commit: nothing to fold
        committed_transaction(
            spark,
            dest_dir,
            lambda base, d=delta: merge(base, agg(d.drop("_commit_version"))),
            batch_id=v,
        )
        applied += 1
    return applied


def _entry_dirs(v) -> list[str]:
    """A partition-map value is one data dir (rewrite) or a LIST of data
    dirs (append generations) — normalize to a list."""
    return [v] if isinstance(v, str) else list(v)


_ESCAPED_VALUE = re.compile(r"%[0-9A-Fa-f]{2}")


def _check_entry_values(written: set[str]) -> None:
    """Partition values round-trip through DIR NAMES: Spark %XX-escapes
    characters like space/':' when writing, but the manifest map, the
    `affected` claim matching, and the read-side `lit(value)` all use
    the raw string — an escaped value would silently mismatch (an
    erasure claim missing its partition, a read re-attaching the encoded
    form). Rather than half-reimplement Spark's escapePathName, reject
    values that needed escaping (and NULL's sentinel dir) up front."""
    for e in written:
        v = e.split("=", 1)[1]
        if _ESCAPED_VALUE.search(v) or v == "__HIVE_DEFAULT_PARTITION__":
            raise ValueError(
                f"partition value {v!r} needs dir-name escaping (or is "
                "NULL), which would break claim matching and value "
                "round-trip; restrict partition values to unescaped "
                "strings like [A-Za-z0-9._-]+"
            )


def _stats_prune(manifest: dict, prune: dict | None) -> dict:
    """Entries of the manifest's partition map that survive data skipping.

    ``prune`` maps column -> (lo, hi) inclusive bounds (None = open), or
    the strings ``"notnull"`` / ``"null"``: ``"notnull"`` skips entries
    whose recorded null count equals their row count (every row IS NULL,
    so no row can match an IS NOT NULL — or any value — predicate);
    ``"null"`` skips entries whose null count is zero. An entry is
    skipped only when its recorded stats PROVE no row can match —
    entries without stats (older manifests, non-stats columns, unknown
    null counts) are always read, so pruning can never change results,
    only cost. This is the manifest half of Delta/Iceberg data skipping
    (min/max/nullCount): the commit log answers "which files can hold
    matching rows" before any file opens."""
    parts = manifest["partitions"]
    if not prune:
        return parts
    stats = manifest.get("stats", {})
    out = {}
    for entry, dirname in parts.items():
        e_stats = stats.get(entry, {})
        cols = e_stats.get("cols", {})
        nulls = e_stats.get("nulls", {})
        keep = True
        for c, bound in prune.items():
            if bound == "notnull":
                if nulls.get(c) is not None and nulls[c] == e_stats.get("n"):
                    keep = False
                    break
                continue
            if bound == "null":
                if nulls.get(c) == 0:
                    keep = False
                    break
                continue
            if c not in cols:
                continue
            lo, hi = bound
            cmin, cmax = cols[c]
            if cmin is None or cmax is None:
                continue  # all-NULL stats column: no bound, never skip
            if (hi is not None and cmin > hi) or (lo is not None and cmax < lo):
                keep = False
                break
        if keep:
            out[entry] = dirname
    return out


def _read_partition_map(
    spark: SparkSession, table_dir: str, manifest: dict, prune: dict | None = None
) -> DataFrame | None:
    """Materialize a partition-mapped manifest: each entry
    ``"col=value" -> data_dir`` is read from ``table_dir/data_dir/col=value``
    (``"."`` = a pre-migration top-level partition dir) with the partition
    column re-attached as a literal — the same column the original
    ``partitionBy`` write encoded in the dir name. Catalyst folds a filter
    on that literal per union branch, so partition pruning survives: a
    predicate on the partition column collapses unaffected branches to
    empty relations and their files are never scanned (the erasure
    rewrite's read path depends on exactly this). ``prune`` additionally
    applies manifest-stats data skipping (`_stats_prune`) so entries the
    stats disprove never even enter the plan.

    Scale shape: entries are grouped by DATA DIR, one multi-path scan
    per generation (basePath = the data dir, so Spark lists exactly the
    mapped partition dirs — the Delta/Iceberg log → file-index read) and
    one union branch per generation, not per partition. Generations stay
    few (each transaction adds one, compaction collapses), so the plan
    is O(generations) even at lake partition counts. The partition
    column is normalized to STRING on every branch — dir-name inference
    would otherwise type `day=2024-01-01` as a date in one generation
    and the lit() branch as a string."""
    base_prune, eq = _split_prune(prune)
    parts = _stats_prune(manifest, base_prune)
    if eq and parts:
        parts = _bloom_prune(spark, manifest, parts, eq)
    if not parts:
        if not manifest["partitions"]:
            return None  # genuinely empty table
        # every partition stats-pruned: an EMPTY relation with the
        # table's full MERGED schema (the unpruned read with its
        # schema-evolving unionByName, folded empty), so callers can
        # still chain filters/selects on columns a later generation
        # added — None means "no table", not "no matching rows". Costs
        # one full plan resolve; fine for the rare all-pruned case.
        full = _read_partition_map(spark, table_dir, manifest, None)
        return full.filter(F.lit(False))
    pcol = manifest["partition_col"]
    by_dir: dict[str, list[str]] = {}
    for entry, dirs in sorted(parts.items()):
        for dirname in _entry_dirs(dirs):
            by_dir.setdefault(dirname, []).append(entry)
    out = None
    # mergeSchema + allowMissingColumns = schema evolution: a generation
    # appended with an extra column reads as NULL in older generations,
    # exactly parquet's own evolution contract.
    for dirname, entries in sorted(by_dir.items()):
        root = os.path.normpath(os.path.join(table_dir, dirname))
        # Footer fast path (guide §1/§6): committed entry dirs almost
        # always hold ONE write's identically-schema'd files, so the
        # schema is derivable driver-side and the read runs ZERO Spark
        # jobs instead of one inference job per generation per read —
        # the dominant job count in the commit-protocol queries. Falls
        # back to the original mergeSchema read whenever footers differ
        # or a type is outside the proven-safe map, and the fast path
        # refuses dirs that already contain the partition column.
        paths = [os.path.join(root, e) for e in entries]
        # manifest-recorded schema first (written once at commit time —
        # zero footer reads AND zero stat() calls per read); footer
        # derivation remains the fallback for pre-feature manifests
        sj = _dir_schema(manifest, dirname)
        fast = T.StructType.fromJson(sj) if sj is not None else (
            _footer_schema(paths)
        )
        if fast is not None and pcol in fast.fieldNames():
            fast = None
        if len(entries) == 1:
            value = entries[0].split("=", 1)[1]
            if fast is not None:
                df = spark.read.schema(fast).parquet(paths[0])
            else:
                df = spark.read.option("mergeSchema", "true").parquet(
                    paths[0]
                )
            df = df.withColumn(pcol, F.lit(value))
        elif fast is not None:
            # partition-dir discovery with a user schema: the dir-name
            # column takes the SUPPLIED string type (same raw values as
            # the inference-off read — no numeric mutation), appended
            # after the data columns exactly where discovery puts it
            df = (
                spark.read.schema(fast.add(pcol, T.StringType()))
                .option("basePath", root)
                .parquet(*paths)
            )
            df = df.withColumn(pcol, F.col(pcol).cast("string"))
        else:
            # Disable partition-dir type inference for this resolve:
            # inferred types mutate numeric-looking values ('007'->7,
            # '1.50'->1.5) once cast back to string, diverging from the
            # single-entry branch's exact F.lit and from the manifest
            # keys. With inference off the discovered column IS the
            # dir-name string (and equality filters on it still reach
            # PartitionFilters, which a filter through a date/int cast
            # would not). The flip only spans this eager resolve, and
            # every reader in this module normalizes the column to
            # string anyway, so a concurrent resolve observing it still
            # reads correct values. The flip itself goes through the
            # reentrant guard — interleaved callers on one session must
            # not capture each other's 'false' as the restore value.
            with _no_partition_inference(spark):
                df = (
                    spark.read.option("basePath", root)
                    .option("mergeSchema", "true")
                    .parquet(*[os.path.join(root, e) for e in entries])
                )
            df = df.withColumn(pcol, F.col(pcol).cast("string"))
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def resolve_version_as_of(table_dir: str, as_of: float) -> int | None:
    """Latest committed version whose publish wall-clock is <= ``as_of``
    (epoch seconds) — Delta's TIMESTAMP AS OF resolution. None when the
    table had no commits yet at that time. Manifests record
    ``committed_at`` once at publish (try_commit), so the mapping is
    stable across restores and replays."""
    best = None
    for m in table_history(table_dir):
        ts = m.get("committed_at")
        if ts is None:
            # pre-feature manifest with no publish timestamp: its place
            # in time is unknown, so it can never RESOLVE an as_of —
            # defaulting it to 0 would answer pre-creation instants
            # with current data
            continue
        if ts <= as_of:
            best = m["version"] if best is None else max(best, m["version"])
    return best


def read_keyed_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    prune: dict | None = None,
    as_of: float | None = None,
    _logical: bool = True,
) -> DataFrame | None:
    """Resolve a committed version and read its data dir, or None before
    the first commit. ``version`` time-travels to an older snapshot
    (committed data dirs are immutable and never overwritten, so every
    version stays readable until vacuumed away by a retention policy —
    this repo never deletes committed versions). Partition-mapped
    manifests (``committed_partition_transaction``) resolve through their
    partition map instead of a single data dir.

    ``prune`` — ``{col: (lo, hi)}`` inclusive bounds, ``{col:
    "notnull"}`` / ``{col: "null"}``, or ``{col: ("eq", value)}`` —
    enables manifest-stats data skipping on partition-mapped tables:
    partitions whose recorded min/max (or null counts) disprove the
    predicate are dropped before any file opens. An ``("eq", value)``
    probe additionally consults the entry's Bloom bitmap when the table
    was written with ``bloom_cols`` — the high-cardinality equality
    case range stats can't disprove (numeric eq values still get the
    degenerate (v, v) range check too). Pruning is advisory-only (entries without stats
    always read); the caller still applies its real filter, so a pruned
    read composed with that filter is ALWAYS equal to the unpruned
    one.

    ``as_of`` (epoch seconds) is TIMESTAMP AS OF time travel: the read
    resolves to the newest version published at or before that moment
    (None if the table didn't exist yet). Mutually exclusive with
    ``version``."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass either version or as_of, not both")
        version = resolve_version_as_of(table_dir, as_of)
        if version is None:
            return None
    if version is not None:
        for m in table_history(table_dir):
            if m["version"] == version:
                if "mor" in m:
                    raise ValueError(
                        f"{table_dir} is a merge-on-read keyed table; "
                        "use read_keyed_mor"
                    )
                if "partitions" in m:
                    # prune specs name LOGICAL columns; stats/blooms are
                    # keyed by the stable PHYSICAL names. Time travel is
                    # map-correct for free: THIS version's manifest
                    # carries the map that was live when it committed.
                    df = _apply_tombstones(
                        spark, table_dir, m,
                        _read_all_layouts(
                            spark, table_dir, m, _physical_names(prune, m)
                        ),
                    )
                    return _to_logical(df, m) if _logical else df
                return _read_parquet_fast(
                    spark,
                    os.path.join(table_dir, m["dir"]),
                    schema_json=_dir_schema(m, m["dir"]),
                )
        legacy = os.path.join(table_dir, f"v{version}")
        if os.path.isdir(legacy):
            return _read_parquet_fast(spark, legacy)
        raise ValueError(f"version {version} not committed in {table_dir}")
    cur = current_commit(table_dir)
    if cur["version"] == 0:
        return None
    if "mor" in cur:
        raise ValueError(
            f"{table_dir} is a merge-on-read keyed table; use read_keyed_mor"
        )
    if "partitions" in cur:
        df = _apply_tombstones(
            spark, table_dir, cur,
            _read_all_layouts(
                spark, table_dir, cur, _physical_names(prune, cur)
            ),
        )
        return _to_logical(df, cur) if _logical else df
    return _read_parquet_fast(
        spark,
        os.path.join(table_dir, cur["dir"]),
        schema_json=_dir_schema(cur, cur["dir"]),
    )


def _read_all_layouts(
    spark: SparkSession, table_dir: str, manifest: dict, prune: dict | None
) -> DataFrame | None:
    """Current layout unioned with every legacy layout (partition
    evolution): each layout prunes against ITS OWN partition column and
    stats; unionByName(allowMissingColumns) supplies NULL for the new
    partition column in legacy files that never stored it as data."""
    out = _read_partition_map(spark, table_dir, manifest, prune)
    for lay in manifest.get("legacy_layouts", []):
        if manifest.get("dir_schemas") and "dir_schemas" not in lay:
            # schemas are keyed by data dir, so the head manifest's map
            # serves the legacy layouts' dirs too (they were recorded
            # when those layouts were current and carried since)
            lay = {**lay, "dir_schemas": manifest["dir_schemas"]}
        part = _read_partition_map(spark, table_dir, lay, prune)
        if part is not None:
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
    return out


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


def _merge_cond(cond, default: bool) -> "F.Column":
    """A clause condition: SQL string over ``s``/``t`` structs, True
    (unconditional), or None (clause absent → ``default``)."""
    if cond is None:
        return F.lit(default)
    if cond is True:
        return F.lit(True)
    return F.expr(cond)


def _materialize_decision(dec: DataFrame) -> DataFrame:
    """Materialize a DML decision frame ONCE for its 2-4 consumers (the
    action rollup, the stage write, the tombstone keys, the CDC
    images).

    localCheckpoint(eager) instead of the old scratch-parquet round
    trip: identical materialize-once semantics — consumers read stored
    blocks, the plan never re-runs, so even a nondeterministic caller
    SET/condition expression cannot diverge between consumers within an
    attempt — but without the tiny-write job-scheduling floor (~0.4 s
    per write at ANY size locally, PERF.md r14; measured 2.7× on the
    materialize+consume cycle). Storage is MEMORY_AND_DISK on the
    executors: memory pressure SPILLS, never recomputes; an executor
    loss fails the job (lineage is truncated) and the commit retries
    from the CAS base — fail-stop, the right failure mode for commit
    machinery, vs. the silent recompute a plain persist() would risk.
    A SIGKILLed writer also no longer leaks a full-row scratch dir
    inside the table dir (the r12 GDPR sweep concern — block-manager
    state dies with the JVM); vacuum keeps reaping legacy scratch-*
    leftovers from older writers.

    Callers release the blocks with .unpersist() in their finally."""
    return dec.localCheckpoint(eager=True)


def merge_into_table(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
    when_matched_update: dict[str, str] | None = None,
    when_matched_update_condition: str | None = None,
    when_matched_delete: str | bool | None = None,
    when_not_matched_insert: bool | dict[str, str] = False,
    when_not_matched_insert_condition: str | None = None,
    when_not_matched_by_source_update: dict[str, str] | None = None,
    when_not_matched_by_source_update_condition: str | None = None,
    when_not_matched_by_source_delete: str | bool | None = None,
    stats_cols: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    evolve_schema: bool = False,
    when_matched: list | None = None,
    when_not_matched_by_source: list | None = None,
    change_data: bool = True,
) -> dict:
    """Conditional multi-clause MERGE INTO on a partition-mapped table —
    Delta's full MERGE surface as ONE commit on the CAS log (VERDICT
    r09 #1; the reference's INSERT OR IGNORE upsert, nshmdb.py:263-266,
    generalized to every clause a CDC-consuming warehouse needs):

    * ``WHEN MATCHED [AND cond] THEN UPDATE SET {col: expr}`` —
      evaluated FIRST for matched rows (Delta's clause order; an
      unconditional update shadows the delete clause);
    * ``WHEN MATCHED [AND cond] THEN DELETE``;
    * ``WHEN NOT MATCHED [AND cond] THEN INSERT`` — True inserts the
      source's columns by name (missing target columns NULL), a dict
      computes each target column;
    * ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE / DELETE``.

    Conditions and SET/INSERT expressions are SQL over two struct
    columns: ``s`` (the source row; NULL when not matched) and ``t``
    (the target row; NULL for inserts) — e.g. ``"s.v > t.v"``,
    ``{"v": "s.v + t.v"}``. A matched row satisfying no clause carries
    unchanged. A target row matched by MULTIPLE source rows raises
    (Delta's ambiguous-merge error); multiple UNMATCHED source rows
    with the same key each insert. NULL join keys never match (SQL
    equality), exactly like the join-based MERGE.

    Execution is the repo's ONE-SHUFFLE union+window shape, not the
    2-shuffle join MERGE: both sides shuffle once on the merge keys,
    each key-group sees the other side via a window max/count, and
    every clause evaluates in that single pass. The decision frame is
    materialized once (_materialize_decision: eager localCheckpoint),
    then three cheap consumers (a per-partition action rollup — bounded
    by the partition domain — the stage write, and the tombstone keys)
    read the stored blocks without recomputing the window.

    Scale shape (the Delta MERGE cost model at partition granularity):

    * partitions whose manifest stats DISPROVE every source key are
      never scanned (no ``BY SOURCE`` clause ⇒ touched-partition
      pruning via the source keys' min/max — one tiny job); when the
      source's distinct key set is small and the table carries Bloom
      bitmaps on the keys, each partition is additionally probed PER
      KEY, so scattered CDC keys spanning the whole range still prune
      (VERDICT r10 stretch #7);
    * scanned partitions whose rows all carry are NOT rewritten —
      their mapping, stats, and blooms carry forward untouched;
    * a partition whose ONLY change is whole-key deletes is tombstoned
      (O(deleted keys), the deletion-vector trade) instead of
      rewritten — composite merge keys included (the dv file carries
      key tuples, VERDICT r10 #2);
    * inserts append a generation to their entry (O(new rows)), never
      rewrite it — whether the partition was scanned or not (VERDICT
      r10 #3: a single new key landing in a large otherwise-unchanged
      partition stages only the new rows, Delta's pure-insert append);
      partition-moving updates landing in UNSCANNED partitions extend
      the same way;
    * only partitions with in-place updates / arrivals into scanned
      partitions / departures are rewritten. ``BY SOURCE`` clauses
      force a full scan — disclosed, same as Delta.

    Tombstone/DV integration: the base is read THROUGH the current
    tombstones (a hidden key is NOT MATCHED, so the insert clause can
    resurrect it), and a merge that inserts while tombstones exist
    consolidates the DV list minus the re-inserted keys — otherwise
    the old tombstone would hide the new row. Partitions that may
    still hold a re-inserted key's STALE physical rows are rewritten
    (purged) in the same commit, so clearing the tombstone can never
    resurrect them. Requires the table's ``dv_key`` columns to equal
    the merge keys (raises otherwise; composite keys are first-class —
    the dv files carry key tuples).

    Commits tag ``op: "merge"``. Concurrency: the merge itself re-runs
    on CAS conflict (its output depends on the base, so its stage
    cannot rebase), but concurrent APPENDS rebase over a published
    merge exactly as over an append when their entries are disjoint
    and the merge left tombstones unchanged (`_rebase_conflict`); an
    append INTO a merged entry conflicts and re-runs. Rewritten
    entries' stats are REPLACED from the stage's parquet footers
    (``stats_cols``); extended entries drop stats/blooms (stat-less =
    never pruned = safe; compaction re-establishes them), and
    rewritten entries drop blooms the same way.

    ``when_matched`` / ``when_not_matched_by_source`` accept Delta's
    GENERAL ordered clause-list form — any number of conditional
    clauses, first satisfied clause wins:
    ``when_matched=[("update", "s.v > t.v", {"v": "s.v"}),
    ("update", None, {"n": "t.n + 1"}), ("delete", "t.stale")]``.
    The keyword pair (update-then-delete) is sugar for the two-clause
    list; passing both forms for one family raises.

    ``change_data=True`` (default) writes Delta's _change_data sidecar:
    a ``cdc-*`` dir recording the merge's EXACT row-level images —
    updates as ``update_preimage``/``update_postimage`` pairs, deletes
    as before-images, inserts as after-images, carried rows absent —
    which `read_table_changes_typed` and the ``changeTypes`` streaming
    source read directly (O(changed rows), no diff-base
    reconstruction; VERDICT r10 #1). ``change_data=False`` skips the
    sidecar write and consumers fall back to map-diff pair images.

    ``evolve_schema=True`` is Delta's MERGE schema auto-merge: columns
    present only in the source join the target schema — SET/INSERT
    expressions may assign them, carried and by-source rows surface
    them as NULL, and only the files this merge writes carry the new
    columns (older generations read them as NULL through the
    mergeSchema read path). Without it, source-only columns are simply
    not part of the output (the SET/INSERT expressions can still READ
    them via ``s.<col>``).

    On a column-mapped table (RENAME/DROP COLUMN history, r13 —
    VERDICT r12 #1) everything the caller writes is the LOGICAL
    schema — merge keys, clause conditions and SET/INSERT expressions
    (``s.col``/``t.col``), ``stats_cols``, the source's columns — and
    the decision frame runs on the logical view exactly like
    UPDATE/DELETE; the staged files, CDC sidecar, and dv key files
    keep the stable PHYSICAL names, and ``evolve_schema=True``
    source-only columns join the map as identity entries (their names
    may not collide with dropped or other columns' physical names —
    rename_column's own rules).

    Returns ``{"version", "updated", "deleted", "inserted",
    "carried"}`` (Delta's operationMetrics)."""
    if isinstance(when_not_matched_insert, dict) and not when_not_matched_insert:
        # {} is truthy-adjacent enough to read as "insert with defaults"
        # but would stage all-NULL rows that only fail much later via
        # the opaque NULL-partition-column raise_error (ADVICE r10)
        raise ValueError(
            "when_not_matched_insert={} inserts all-NULL rows; pass True "
            "(insert source columns by name) or a non-empty {col: expr} map"
        )
    has_insert = bool(when_not_matched_insert) or isinstance(
        when_not_matched_insert, dict
    )
    if when_matched_update_condition is not None and when_matched_update is None:
        raise ValueError("when_matched_update_condition without its clause")
    if (
        when_not_matched_insert_condition is not None
        and not when_not_matched_insert
    ):
        raise ValueError("when_not_matched_insert_condition without its clause")
    if not keys:
        raise ValueError("merge keys must be non-empty")
    for k in keys:
        if k in ("s", "t", "_side"):
            raise ValueError(f"merge key {k!r} collides with merge internals")
    def _norm_clauses(name, lst, upd_map, upd_cond, del_clause):
        """Normalize to an ORDERED [(kind, cond_or_None, map_or_None)]
        list — either the explicit clause list (Delta's general form,
        any number of conditional clauses, first match wins) or the
        two-clause keyword sugar (update first, then delete)."""
        if lst is not None:
            if (
                upd_map is not None
                or upd_cond is not None
                or del_clause is not None
            ):
                raise ValueError(
                    f"pass {name} OR its keyword sugar, not both"
                )
            if isinstance(lst, tuple) and lst and isinstance(lst[0], str):
                # the easy API mistake: a bare clause tuple instead of
                # a list of tuples — iterating it would produce the
                # misleading "unknown clause kind 'u'" (r10 sweep)
                lst = [lst]
            out = []
            for cl in lst:
                if not isinstance(cl, (tuple, list)) or not cl:
                    raise ValueError(
                        f"{name} must be a list of ('update', cond, "
                        "{col: expr}) / ('delete', cond) tuples"
                    )
                kind = cl[0]
                if kind == "update":
                    if len(cl) != 3 or not isinstance(cl[2], dict):
                        raise ValueError(
                            f"{name} update clause must be "
                            "('update', cond, {col: expr})"
                        )
                    cond = cl[1]
                elif kind == "delete":
                    if len(cl) != 2:
                        raise ValueError(
                            f"{name} delete clause must be ('delete', cond)"
                        )
                    cond = cl[1]
                else:
                    raise ValueError(f"unknown {name} clause kind {kind!r}")
                if cond is not None and cond is not True and not isinstance(
                    cond, str
                ):
                    raise ValueError(
                        f"{name} clause condition must be None, True, or "
                        "a SQL string"
                    )
                out.append(
                    (
                        kind,
                        None if cond is True else cond,
                        cl[2] if kind == "update" else None,
                    )
                )
            return out
        if del_clause is not None and del_clause is not True and not isinstance(
            del_clause, str
        ):
            raise ValueError(
                f"{name} delete sugar must be None, True, or a condition "
                "SQL string"
            )
        out = []
        if upd_map is not None:
            out.append(("update", upd_cond, upd_map))
        if del_clause is not None:
            out.append(
                ("delete", None if del_clause is True else del_clause, None)
            )
        return out

    m_clauses = _norm_clauses(
        "when_matched", when_matched, when_matched_update,
        when_matched_update_condition, when_matched_delete,
    )
    b_clauses = _norm_clauses(
        "when_not_matched_by_source", when_not_matched_by_source,
        when_not_matched_by_source_update,
        when_not_matched_by_source_update_condition,
        when_not_matched_by_source_delete,
    )
    has_matched = bool(m_clauses)
    by_source = bool(b_clauses)
    if not (has_matched or has_insert or by_source):
        raise ValueError("merge_into_table needs at least one clause")

    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0:
            raise ValueError(
                f"{table_dir} has no commits; a merge into an empty table "
                "is an append — use append_partition_transaction"
            )
        if "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is a single-dir committed table; use "
                "merge_into + committed_transaction"
            )
        if cur.get("legacy_layouts"):
            raise ValueError(
                f"{table_dir} has unmigrated legacy partition layouts; a "
                "merge computed against the current layout would miss "
                "their rows — run migrate_legacy_layouts first"
            )
        # column mapping (r13 — the VERDICT r12 #1 lift): like
        # UPDATE/DELETE, the whole decision frame runs in LOGICAL
        # names — keys, clause expressions (``s.col``/``t.col``), the
        # insert map, stats_cols, the source's columns — and translates
        # to the stable PHYSICAL names exactly three times: stats/bloom
        # pruning lookups, the staged files, and the on-disk sidecars
        # (CDC images + dv key files). The reference's J13 upsert
        # (nshmdb.py:263-266) is the degenerate MERGE and must survive
        # a rename without a rewrite.
        cmap = _column_map(cur)
        pkeys = [cmap.get(k, k) for k in keys]
        if cur.get("dv") and _dv_keys(cur) != pkeys:
            raise ValueError(
                f"{table_dir} tombstones key {cur.get('dv_key')!r}; a merge "
                f"on {keys!r} (physical {pkeys!r}) cannot maintain the "
                "deletion vectors — materialize_tombstones first"
            )
        if batch_id is not None and batch_id in committed_batch_ids(table_dir):
            return {"version": cur["version"], "updated": 0, "deleted": 0,
                    "inserted": 0, "carried": 0, "replayed": True}
        pcol = cur["partition_col"]
        prefix = f"{pcol}="

        # ---- touched-partition pruning (no BY SOURCE clause only) ----
        scan_parts = cur["partitions"]
        if not by_source and cur.get("stats"):
            b = source.agg(
                *[F.min(k).alias(f"_lo{i}") for i, k in enumerate(keys)],
                *[F.max(k).alias(f"_hi{i}") for i, k in enumerate(keys)],
            ).collect()[0]  # 1-row bounds job (sanctioned shape)
            prune = {
                pkeys[i]: (b[f"_lo{i}"], b[f"_hi{i}"])
                for i in range(len(keys))
                if b[f"_lo{i}"] is not None
            }
            scan_parts = _stats_prune(cur, prune)
        if (
            not by_source
            and scan_parts
            and cur.get("bloom")
            and any(
                c in specs
                for specs in cur["bloom"].values()
                for c in pkeys
            )
        ):
            # bloom-probe refinement (VERDICT r10 stretch #7): one
            # global min/max range degrades to nothing when the source
            # keys are SCATTERED (the CDC-batch case — a handful of
            # keys spanning the table's whole range). When the source's
            # distinct key set is small (<= _MERGE_BLOOM_PROBE_CAP, one
            # limit-bounded job), probe each partition's Bloom bitmaps
            # per key instead: a partition survives only if SOME source
            # key may be present in it. Conservative like all skipping —
            # a missing bitmap or NULL key component keeps the entry.
            ks = (
                source.select(*keys)
                .distinct()
                .limit(_MERGE_BLOOM_PROBE_CAP + 1)
                .collect()
            )
            if len(ks) <= _MERGE_BLOOM_PROBE_CAP:
                blooms = cur["bloom"]
                # ONE probe-position job per (column, spec) across all
                # keys, and one bitmap decode per (entry, column) —
                # not per (key, entry) (r11 review #3)
                for c, pc in zip(keys, pkeys):
                    for spec in {
                        (sp["m"], sp["k"], sp["t"])
                        for e in scan_parts
                        for sp in [blooms.get(e, {}).get(pc)]
                        if sp is not None and "t" in sp
                    }:
                        _bloom_probes_prefetch(
                            spark, [row[c] for row in ks], *spec
                        )
                bits_of: dict = {}

                def _entry_bits(entry: str, c: str, sp: dict):
                    ck = (entry, c)
                    if ck not in bits_of:
                        bits_of[ck] = base64.b64decode(sp["bits"])
                    return bits_of[ck]

                def _may(entry: str, pc: str, v) -> bool:
                    sp = blooms.get(entry, {}).get(pc)
                    if sp is None or v is None or "t" not in sp:
                        return True
                    return _bloom_may_contain(
                        spark, sp, v, bits=_entry_bits(entry, pc, sp)
                    )

                scan_parts = {
                    entry: dirname
                    for entry, dirname in scan_parts.items()
                    if any(
                        all(
                            _may(entry, pc, row[c])
                            for c, pc in zip(keys, pkeys)
                        )
                        for row in ks
                    )
                }
        scanned_vals = {e.split("=", 1)[1] for e in scan_parts}

        # target LOGICAL schema from the full map (plan resolve, zero
        # jobs) — on a mapped table the merge surface is the logical
        # view throughout
        full = _to_logical(_read_partition_map(spark, table_dir, cur), cur)
        tcols = list(full.columns)
        ttypes = dict(zip(full.schema.names, [f.dataType for f in full.schema]))
        base_cols = set(tcols)
        if evolve_schema:
            # Delta's schema auto-merge: source-only columns join the
            # target schema. Only the rewritten/extended files carry
            # them; older generations read them as NULL through the
            # mergeSchema read path — parquet's own evolution contract.
            src_types = dict(
                zip(source.schema.names, [f.dataType for f in source.schema])
            )
            for c in source.columns:
                if c not in base_cols:
                    # joining a mapped table's schema: the new column
                    # maps to itself, so its name must not collide with
                    # retained dropped data or another column's stable
                    # physical name (rename_column's own rules)
                    if c in _dropped_physical(cur):
                        raise ValueError(
                            f"evolved column {c!r} was dropped from this "
                            "table (metadata-only); its physical data "
                            "still exists — pick a different name"
                        )
                    if c in set(cmap.values()):
                        raise ValueError(
                            f"evolved column {c!r} is another column's "
                            "physical name; pick a name not in the "
                            "physical schema"
                        )
                    tcols.append(c)
                    ttypes[c] = src_types[c]
        for k in keys:
            if k not in tcols:
                raise ValueError(f"merge key {k!r} not a target column")
            if k not in source.columns:
                raise ValueError(f"merge key {k!r} not a source column")

        base = None
        if scan_parts:
            base = _apply_tombstones(
                spark, table_dir, cur,
                _read_partition_map(
                    spark, table_dir,
                    {
                        "partition_col": pcol,
                        "partitions": scan_parts,
                        "dir_schemas": cur.get("dir_schemas") or {},
                    },
                ),
            )
            if base is not None and (cmap or _dropped_physical(cur)):
                # mapped table: lift the physical base read to the
                # LOGICAL view once, padding columns the pruned scan
                # lacks as typed NULLs — the tombstone anti-join above
                # ran first (dv key files carry physical names)
                bhave = set(base.columns)
                base = base.select(
                    *[
                        (
                            F.col(cmap.get(c, c))
                            if cmap.get(c, c) in bhave
                            else F.lit(None).cast(ttypes[c])
                        ).alias(c)
                        for c in tcols
                        if c in base_cols
                    ]
                )

        # ---- the one-shuffle decision pass ----
        s2 = source.select(
            *keys, F.lit("s").alias("_side"),
            F.struct(*[F.col(c) for c in source.columns]).alias("s"),
        )
        if base is not None:
            # the pruned base may lack columns only UNSCANNED
            # generations carry (schema evolution + stats pruning) —
            # pad them as typed NULLs so the full-table struct resolves
            # (r10 review #1)
            have = set(base.columns)
            t2 = base.select(
                *keys, F.lit("t").alias("_side"),
                F.struct(
                    *[
                        F.col(c) if c in have
                        else F.lit(None).cast(ttypes[c]).alias(c)
                        for c in sorted(base_cols, key=tcols.index)
                    ]
                ).alias("t"),
            )
            u = t2.unionByName(s2, allowMissingColumns=True)
        else:
            u = s2.withColumn(
                "t",
                F.lit(None).cast(
                    T.StructType(
                        [
                            T.StructField(c, ttypes[c])
                            for c in tcols
                            if c in base_cols
                        ]
                    )
                ),
            )
        w = Window.partitionBy(*keys)
        keyed = F.lit(True)
        for k in keys:
            keyed = keyed & F.col(k).isNotNull()
        u = (
            u.withColumn("_s_cnt", F.count("s").over(w))
            .withColumn("_t_cnt", F.count("t").over(w))
            .withColumn("_s_any", F.max("s").over(w))
            .withColumn(
                "s",
                F.when(F.col("_side") == "t", F.col("_s_any")).otherwise(
                    F.col("s")
                ),
            )
            .withColumn("_keyed", keyed)
        )
        matched = F.col("_keyed") & (F.col("_s_cnt") == 1)
        unmatched_t = ~F.col("_keyed") | (F.col("_s_cnt") == 0)
        dup = F.col("_keyed") & (F.col("_s_cnt") > 1)
        # ordered clause evaluation — the FIRST satisfied clause wins,
        # Delta's rule; update clauses get positional labels so each
        # keeps its own SET map
        t_branch = F.when(
            dup,
            F.raise_error(
                F.concat(
                    F.lit("MERGE: multiple source rows match target key ("),
                    F.concat_ws(
                        ",", *[F.col(k).cast("string") for k in keys]
                    ),
                    F.lit(")"),
                )
            ).cast("string"),
        )
        update_labels: list[str] = []
        for i, (kind, cond, _mp) in enumerate(m_clauses):
            label = "delete" if kind == "delete" else f"u{i}"
            if kind == "update":
                update_labels.append(label)
            t_branch = t_branch.when(
                matched & _merge_cond(cond, True), F.lit(label)
            )
        for i, (kind, cond, _mp) in enumerate(b_clauses):
            label = "delete" if kind == "delete" else f"b{i}"
            if kind == "update":
                update_labels.append(label)
            t_branch = t_branch.when(
                unmatched_t & _merge_cond(cond, True), F.lit(label)
            )
        act = F.when(
            F.col("_side") == "t", t_branch.otherwise(F.lit("carry"))
        ).otherwise(
            F.when(
                ((F.col("_t_cnt") == 0) | ~F.col("_keyed"))
                & F.lit(has_insert)
                & _merge_cond(when_not_matched_insert_condition, True),
                F.lit("insert"),
            ).otherwise(F.lit("drop"))
        )
        dec = u.withColumn("_act", act).filter(F.col("_act") != "drop")

        ins_map = (
            when_not_matched_insert
            if isinstance(when_not_matched_insert, dict)
            else {c: f"s.{c}" for c in tcols if c in source.columns}
        )
        def t_val(c: str):
            # carry value: an evolved (source-only) column has no t
            # field — older rows carry NULL, parquet evolution's rule
            return (
                F.expr(f"t.{c}")
                if c in base_cols
                else F.lit(None).cast(ttypes[c])
            )

        def clause_val(mapping: dict | None, c: str):
            m_ = mapping or {}
            return F.expr(m_[c]) if c in m_ else t_val(c)

        out_cols = []
        for c in tcols:
            col = F.when(
                F.col("_act") == "insert",
                F.expr(ins_map[c])
                if c in ins_map
                else F.lit(None).cast(ttypes[c]),
            )
            for i, (kind, _cond, mapping) in enumerate(m_clauses):
                if kind == "update":
                    col = col.when(
                        F.col("_act") == f"u{i}", clause_val(mapping, c)
                    )
            for i, (kind, _cond, mapping) in enumerate(b_clauses):
                if kind == "update":
                    col = col.when(
                        F.col("_act") == f"b{i}", clause_val(mapping, c)
                    )
            col = col.otherwise(t_val(c)).cast(ttypes[c])
            if c == pcol:
                # updates can also null the partition column (r10
                # review #5): without the guard the NULL leaks into the
                # rollup and fails later with an opaque sorted() error
                col = F.when(
                    (F.col("_act") != "carry")
                    & (F.col("_act") != "delete")
                    & col.isNull(),
                    F.raise_error(
                        F.lit(
                            f"MERGE: merged row has NULL partition "
                            f"column {pcol!r}"
                        )
                    ).cast("string"),
                ).otherwise(col).cast("string")
            out_cols.append(col.alias(c))
        dec = dec.select(
            *out_cols,
            (
                F.when(
                    F.col("_act").isin(*update_labels), F.lit("update")
                ).otherwise(F.col("_act"))
                if update_labels
                else F.col("_act")
            ).alias("_action"),
            F.expr(f"t.{pcol}").cast("string").alias("_t_part"),
            # pre-image carrier for the CDC sidecar: update rows keep
            # their full BEFORE struct (NULL for everything else, so
            # the materialized frame stays change-sized on that column)
            (
                F.when(F.col("_act").isin(*update_labels), F.col("t"))
                if update_labels
                else F.lit(None).cast(
                    T.StructType(
                        [
                            T.StructField(c, ttypes[c])
                            for c in tcols
                            if c in base_cols
                        ]
                    )
                )
            ).alias("_pre"),
        )

        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        dv_stage = None
        cdc_stage = None
        try:
            dec = _materialize_decision(dec)

            # per-partition action rollup — bounded by the partition
            # domain (the repo's sanctioned bounded-collect shape)
            null_key = F.lit(False)
            for k in keys:
                null_key = null_key | F.col(k).isNull()
            rollup = (
                dec.groupBy(
                    "_action", "_t_part", F.col(pcol).alias("_p"),
                    null_key.alias("_kn"),
                )
                .count()
                .collect()
            )
            upd_in, ins_in, del_in, moved_out = set(), set(), set(), set()
            null_del = set()  # partitions with NULL-key delete rows
            n_upd = n_del = n_ins = n_carry = 0
            for r in rollup:
                if r._action == "carry":
                    n_carry += r["count"]
                elif r._action == "update":
                    n_upd += r["count"]
                    upd_in.add(r._p)
                    if r._p != r._t_part:
                        moved_out.add(r._t_part)
                elif r._action == "delete":
                    n_del += r["count"]
                    del_in.add(r._t_part)
                    if r._kn:
                        # a NULL merge key cannot be expressed as a key
                        # tombstone: the read-side anti-join on NULL
                        # matches nothing, so the "deleted" row would
                        # silently survive (and poison the dv key files
                        # for the typed stream reader) — force the
                        # partition to rewrite instead (ADVICE r10)
                        null_del.add(r._t_part)
                else:
                    n_ins += r["count"]
                    ins_in.add(r._p)
            # Inserts do NOT force a rewrite by themselves (VERDICT r10
            # #3 — Delta appends new files for pure inserts): a scanned
            # partition whose only change is arrivals of NEW keys takes
            # a generation append below (extend_vals), O(new rows)
            # instead of O(partition). Only in-place updates, moves,
            # and (non-tombstonable) deletes rewrite.
            rewrite_vals = {v for v in upd_in if v in scanned_vals} | moved_out
            if cur.get("dv") and n_ins:
                # re-inserting a tombstoned key clears it from the DV
                # (consolidation below) — which would RESURRECT the
                # key's stale physical rows in their old partitions.
                # Those partitions must be rewritten (purged) in this
                # same commit: their staged content is the tombstone-
                # filtered base read, so the stale rows drop out. They
                # are necessarily in the scan set (a re-inserted key is
                # a source key, and pruning kept every partition whose
                # stats can hold one); one extra bounds job, only on
                # the dv-and-inserts path. (Found by the CDC-apply
                # replica≠head pin, r10.)
                reins = (
                    dec.filter(F.col("_action") == "insert")
                    .select(*keys)
                    .join(
                        _read_parquet_fast(
                            spark,
                            *[
                                os.path.join(table_dir, d)
                                for d in cur["dv"]
                            ],
                            schema_json=_dirs_schema(cur, cur["dv"]),
                        )
                        # dv files carry PHYSICAL key names; the
                        # decision frame is logical
                        .select(
                            *[
                                F.col(pk).alias(k)
                                for k, pk in zip(keys, pkeys)
                            ]
                        )
                        .distinct(),
                        on=keys,
                        how="left_semi",
                    )
                )
                rb = reins.agg(
                    *[F.min(k).alias(f"_lo{i}") for i, k in enumerate(keys)],
                    *[F.max(k).alias(f"_hi{i}") for i, k in enumerate(keys)],
                ).collect()[0]
                if rb["_lo0"] is not None:
                    stale = _stats_prune(
                        {
                            "partitions": dict(scan_parts),
                            "stats": cur.get("stats", {}),
                        },
                        {
                            pkeys[i]: (rb[f"_lo{i}"], rb[f"_hi{i}"])
                            for i in range(len(keys))
                        },
                    )
                    rewrite_vals |= {
                        e.split("=", 1)[1] for e in stale
                    }
            rewrite_vals |= null_del & del_in
            cand = del_in - rewrite_vals
            if cand:
                # the DV path is sound only for WHOLE-KEY deletes: a key
                # with duplicate target rows and a row-divergent delete
                # condition (one row deletes here, another carries or
                # updates elsewhere) must NOT be tombstoned — the
                # key-wide tombstone would hide the surviving row
                # everywhere (ADVICE r10 high). One bounded aggregation
                # over the decision frame (guarded: only merges with
                # tombstone-candidate partitions pay it); the output is
                # the mixed keys' delete partitions — partition-domain
                # bounded, the sanctioned collect shape.
                keyed_rows = F.lit(True)
                for k in keys:
                    keyed_rows = keyed_rows & F.col(k).isNotNull()
                mixed = (
                    dec.filter((F.col("_action") != "insert") & keyed_rows)
                    .groupBy(*keys)
                    .agg(
                        F.collect_set(
                            F.when(
                                F.col("_action") == "delete",
                                F.col("_t_part"),
                            )
                        ).alias("_dp"),
                        F.max(
                            (F.col("_action") != "delete").cast("int")
                        ).alias("_live"),
                    )
                    .filter((F.size("_dp") > 0) & (F.col("_live") == 1))
                    .select(F.explode("_dp").alias("_p"))
                    .distinct()
                    .collect()
                )
                rewrite_vals |= {r._p for r in mixed} & cand
            # extend = generation append: unscanned arrival partitions
            # (whole partition absent from the base read) AND scanned
            # insert-only partitions (their carried rows stay in the old
            # generations; only the _act == "insert" rows are staged)
            extend_vals = (upd_in | ins_in) - scanned_vals - rewrite_vals
            extend_vals |= (ins_in & scanned_vals) - rewrite_vals
            tomb_vals = del_in - rewrite_vals  # delete-only: DV, not rewrite

            write_vals = sorted(rewrite_vals | extend_vals)
            written: set[str] = set()
            if write_vals:
                # per-partition staging mode: rewrites stage every
                # surviving row; extended entries stage ONLY the rows
                # this merge created there (inserts, moved-in updates) —
                # their carried rows live on in the prior generations.
                # The value sets are driver-known literals, so they fold
                # into the plan as isin predicates — the old tiny
                # createDataFrame + broadcast join cost a
                # defaultParallelism-task collect job per merge for rows
                # the driver already held (guide §1; same class as the
                # r14 VALUES bloom-probe rewrite).
                _rw = (
                    F.col(pcol).isin(sorted(rewrite_vals))
                    if rewrite_vals
                    else F.lit(False)
                )
                stage_rows = (
                    dec.filter(F.col("_action") != "delete")
                    .filter(F.col(pcol).isin(write_vals))
                    .filter(
                        _rw
                        | F.col("_action").isin("insert", "update")
                    )
                    .drop("_action", "_t_part", "_pre")
                    # back to the stable PHYSICAL names for the staged
                    # files (evolved source-only columns map to
                    # themselves)
                    .select(
                        *[F.col(c).alias(cmap.get(c, c)) for c in tcols]
                    )
                )
                _distribute_for_partitioned_write(
                    stage_rows, pcol, nvals=len(write_vals)
                ).write.mode("overwrite").partitionBy(pcol).parquet(
                    stage_path
                )
                written = {
                    n for n in os.listdir(stage_path) if n.startswith(prefix)
                }
                _check_entry_values(written)
                if cur.get("constraints") and written:
                    _enforce_constraints(
                        _read_partition_map(
                            spark, table_dir,
                            {
                                "partition_col": pcol,
                                "partitions": {
                                    e: stage for e in sorted(written)
                                },
                                "dir_schemas": {
                                    stage: _file_schema_json(
                                        stage_rows.schema, drop=pcol
                                    )
                                },
                            },
                        ),
                        cur["constraints"],
                        stage_path,
                        manifest=cur,
                    )

            # ---- deletion-vector bookkeeping ----
            new_dv = cur.get("dv", [])
            dv_key = cur.get("dv_key")
            if tomb_vals or (new_dv and n_ins):
                # dv files carry the PHYSICAL key names (the whole
                # read/typed-feed side addresses them that way); the
                # consolidation joins run in logical names and the
                # final write aliases back
                dv_key = _dv_key_field(pkeys)
                tomb_df = None
                if tomb_vals:
                    # driver-known literal set: isin folds into the
                    # plan (the semi join against a tiny createDataFrame
                    # paid a defaultParallelism-task collect per merge)
                    tomb_df = (
                        dec.filter(F.col("_action") == "delete")
                        .filter(F.col("_t_part").isin(sorted(tomb_vals)))
                        .select(*keys)
                    )
                if new_dv and n_ins:
                    # consolidate: re-inserted keys must leave the DV or
                    # the old tombstone hides the new row
                    old_keys = (
                        _read_parquet_fast(
                            spark,
                            *[os.path.join(table_dir, d) for d in new_dv],
                        )
                        .select(
                            *[
                                F.col(pk).alias(k)
                                for k, pk in zip(keys, pkeys)
                            ]
                        )
                        .distinct()
                    )
                    ins_keys = (
                        dec.filter(F.col("_action") == "insert")
                        .select(*keys)
                        .distinct()
                    )
                    kept = old_keys.join(ins_keys, on=keys, how="left_anti")
                    tomb_df = (
                        kept
                        if tomb_df is None
                        else kept.unionByName(tomb_df)
                    )
                    new_dv = []
                dv_stage = f"data-{uuid.uuid4().hex}"
                dvf = tomb_df.distinct().select(
                    *[F.col(k).alias(pk) for k, pk in zip(keys, pkeys)]
                )
                dvf.write.mode("overwrite").parquet(
                    os.path.join(table_dir, dv_stage)
                )
                new_dv = new_dv + [dv_stage]

            # ---- manifest ----
            new_parts = dict(cur["partitions"])
            for v in rewrite_vals:
                new_parts.pop(f"{prefix}{v}", None)
            for e in written:
                v = e.split("=", 1)[1]
                if v in extend_vals and e in cur["partitions"]:
                    new_parts[e] = _entry_dirs(cur["partitions"][e]) + [stage]
                else:
                    new_parts[e] = stage
            new_stats, new_bloom = _carry_stats_blooms(
                cur, written, new_parts, extend_vals, stage_path, stats_cols
            )
            if not write_vals and not dv_stage:
                # nothing changed (every row carried): Delta skips
                # empty commits; so do we
                if n_upd or n_del or n_ins:
                    raise AssertionError("actions counted but nothing staged")
                return {
                    "version": cur["version"], "updated": 0, "deleted": 0,
                    "inserted": 0, "carried": n_carry,
                }

            # ---- CDC sidecar (Delta's _change_data files) ----
            # The decision frame knows every row-level action, so the
            # merge records its EXACT images at commit time: update rows
            # as update_preimage/update_postimage PAIRS (keyed by
            # construction — same dec row), deletes as their before
            # image, inserts as their after image, carried rows absent
            # (Delta's dataChange discipline). The typed change feed
            # (batch and stream) then reads this O(changed rows) dir
            # instead of reconstructing pair images from map diffs —
            # VERDICT r10 #1 / ADVICE r09 #5 second half. One
            # change-sized write per merge; `change_data=False` skips it
            # and consumers fall back to the pair reconstruction.
            if change_data and (n_upd or n_del or n_ins):
                pre_fields, cur_fields, _img = _cdc_image_parts(
                    tcols, ttypes, base_cols
                )
                cdc_rows = (
                    dec.filter(F.col("_action") != "carry")
                    .select(
                        F.explode(
                            F.when(
                                F.col("_action") == "update",
                                F.array(
                                    _img(pre_fields, "update_preimage"),
                                    _img(cur_fields, "update_postimage"),
                                ),
                            )
                            .when(
                                F.col("_action") == "delete",
                                F.array(_img(cur_fields, "delete")),
                            )
                            .otherwise(
                                F.array(_img(cur_fields, "insert"))
                            )
                        ).alias("_c")
                    )
                    .select("_c.*")
                    # the sidecar stores PHYSICAL names (update_table's
                    # contract) so the feeds' one end-projection is
                    # uniform across the DML triad
                    .select(
                        *[F.col(c).alias(cmap.get(c, c)) for c in tcols],
                        F.col("_change_type"),
                    )
                )
                cdc_stage = f"cdc-{uuid.uuid4().hex}"
                cdc_rows.write.mode("overwrite").parquet(
                    os.path.join(table_dir, cdc_stage)
                )
            manifest = {
                "version": cur["version"] + 1,
                # a delete-only merge stages no data files: anchor the
                # manifest on the DV stage instead (tombstone_keys' shape)
                "dir": stage if write_vals else dv_stage,
                "partition_col": pcol,
                "partitions": new_parts,
                "batch_ids": [batch_id] if batch_id is not None else [],
                "op": "merge",
            }
            if new_stats:
                manifest["stats"] = new_stats
            if new_bloom:
                manifest["bloom"] = new_bloom
            if cur.get("constraints"):
                manifest["constraints"] = cur["constraints"]
            _carry_column_map(manifest, cur)
            if new_dv:
                manifest["dv"] = new_dv
                manifest["dv_key"] = dv_key
            if cdc_stage:
                manifest["cdc"] = cdc_stage
            _note_dir_schemas(
                manifest,
                cur,
                {
                    (stage if write_vals else ""): (
                        _file_schema_json(stage_rows.schema, drop=pcol)
                        if write_vals and written
                        else None
                    ),
                    (dv_stage or ""): (
                        _file_schema_json(dvf.schema) if dv_stage else None
                    ),
                    (cdc_stage or ""): (
                        _file_schema_json(cdc_rows.schema)
                        if cdc_stage
                        else None
                    ),
                },
            )
            anchor = stage_path if write_vals else os.path.join(
                table_dir, dv_stage
            )
            if _publish(table_dir, manifest, anchor):
                return {
                    "version": manifest["version"], "updated": n_upd,
                    "deleted": n_del, "inserted": n_ins, "carried": n_carry,
                }
            # CAS lost: the merge's output depends on the base, so no
            # rebase — drop everything and re-run against the winner
            shutil.rmtree(stage_path, ignore_errors=True)
            if dv_stage:
                shutil.rmtree(
                    os.path.join(table_dir, dv_stage), ignore_errors=True
                )
            if cdc_stage:
                shutil.rmtree(
                    os.path.join(table_dir, cdc_stage), ignore_errors=True
                )
        finally:
            dec.unpersist()
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
    )


def update_table(
    spark: SparkSession,
    table_dir: str,
    set_exprs: dict[str, str],
    where: str | None = None,
    stats_cols: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    prune: dict | None = None,
    change_data: bool = True,
) -> dict:
    """Standalone UPDATE ... SET ... WHERE on a partition-mapped table —
    the third leg of the DML triad (Delta's UPDATE; DELETE is
    `delete_table` (predicate, COW) / `tombstone_keys` (key, MOR),
    upsert is `merge_into_table`). No key or source required: ``where``
    is a SQL
    predicate over the row (NULL = not matched, Delta's rule),
    ``set_exprs`` maps columns to SQL expressions evaluated over the
    OLD row (``{"v": "v * 2", "flag": "'hot'"}``).

    Partition economics mirror the merge's: only partitions holding a
    matched row (or receiving a moved one) rewrite; a partition-moving
    update rewrites the departure side and EXTENDS unscanned arrival
    partitions with just the moved rows; everything else carries
    byte-identical. ``prune`` is the advisory manifest-stats hint
    (``{col: (lo, hi)}`` etc. — same spec as `read_keyed_table`):
    entries it skips are never scanned, so it must PROVE no row there
    matches ``where`` (the caller's contract, exactly like a pruned
    read composed with its own filter). Without it the decision pass
    scans the table once — Delta's own default when stats can't narrow
    the predicate.

    Updating the partition column to NULL raises. The base is read
    THROUGH the tombstones (hidden rows are not updated; a rewritten
    partition physically purges them — state-identical, the dv carries
    forward). Commits tag ``op: "update"`` and write the same
    ``cdc-*`` sidecar as MERGE (``update_preimage``/
    ``update_postimage`` pairs; ``change_data=False`` opts out and the
    typed feeds fall back to map-diff pair images). Concurrency: the
    update re-runs on CAS conflict; disjoint concurrent appends rebase
    over a published update exactly as over a merge. On a
    column-mapped table (RENAME/DROP COLUMN history) everything here
    is the LOGICAL schema — predicate, SET targets, prune, stats_cols
    — and the staged files / CDC sidecar keep the stable physical
    names. Returns ``{"version", "updated", "carried"}``."""
    if not set_exprs:
        raise ValueError("update_table needs a non-empty SET map")
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        if cur.get("legacy_layouts"):
            raise ValueError(
                f"{table_dir} has unmigrated legacy partition layouts; an "
                "update computed against the current layout would miss "
                "their rows — run migrate_legacy_layouts first"
            )
        if batch_id is not None and batch_id in committed_batch_ids(table_dir):
            return {"version": cur["version"], "updated": 0, "carried": 0,
                    "replayed": True}
        if cur.get("dv") and set(_dv_keys(cur)) & set(set_exprs):
            # assigning a tombstoned key column can write a value the
            # carried-forward deletion vector HIDES — silent row loss
            # (r11 review) — and merge's consolidation machinery is the
            # right tool for key-changing writes
            raise ValueError(
                f"{table_dir} tombstones key {cur.get('dv_key')!r}; an "
                "UPDATE assigning that column could write rows the "
                "deletion vector hides — materialize_tombstones first, "
                "or use merge_into_table (which consolidates the DV)"
            )
        pcol = cur["partition_col"]
        prefix = f"{pcol}="
        # column mapping (r12): the whole decision frame runs in
        # LOGICAL names — ``where``/``set_exprs``/``prune``/
        # ``stats_cols`` are what the user sees — and translates back
        # to the stable PHYSICAL names exactly twice: at the survivor
        # stage and at the CDC sidecar (both on-disk artifacts). A
        # rewritten partition physically sheds DROPPED columns' data
        # (state-identical: the current version never projects them,
        # old versions keep their old dirs).
        cmap = _column_map(cur)
        # full prune spec support, same as read_keyed_table: range/null
        # bounds through stats, ("eq", v) probes through stats' (v, v)
        # degenerate range AND the Bloom bitmaps (r11 review — passing
        # the raw eq tuple into _stats_prune mis-compared it as bounds)
        base_prune, eq = _split_prune(_physical_names(prune, cur))
        scan_parts = dict(_stats_prune(cur, base_prune))
        if eq and scan_parts:
            scan_parts = dict(_bloom_prune(spark, cur, scan_parts, eq))
        scanned_vals = {e.split("=", 1)[1] for e in scan_parts}
        if not scan_parts:
            # every partition disproven: O(manifest) no-op — the full
            # mergeSchema resolve below reads every live footer, which
            # a pruned-empty update must not pay (r12 review sweep 2
            # #6; SET-column name validation is skipped on this path)
            return {"version": cur["version"], "updated": 0, "carried": 0}

        # full-table LOGICAL schema (plan resolve, zero jobs) so a
        # pruned base missing evolved columns still projects them as
        # typed NULLs
        full = _to_logical(_read_partition_map(spark, table_dir, cur), cur)
        tcols = list(full.columns)
        ttypes = dict(zip(full.schema.names, [f.dataType for f in full.schema]))
        for c in set_exprs:
            if c not in tcols:
                raise ValueError(f"SET column {c!r} not a table column")

        base = (
            _apply_tombstones(
                spark, table_dir, cur,
                _read_partition_map(
                    spark, table_dir,
                    {
                        "partition_col": pcol,
                        "partitions": scan_parts,
                        "dir_schemas": cur.get("dir_schemas") or {},
                    },
                ),
            )
            if scan_parts
            else None
        )
        if base is None:
            return {"version": cur["version"], "updated": 0, "carried": 0}
        have = set(base.columns)  # PHYSICAL names on disk
        dec = base.select(
            *[
                (
                    F.col(cmap.get(c, c))
                    if cmap.get(c, c) in have
                    else F.lit(None).cast(ttypes[c])
                ).alias(c)
                for c in tcols
            ]
        )
        lhave = {c for c in tcols if cmap.get(c, c) in have}
        # NULL predicate = not matched (Delta's UPDATE rule)
        upd = F.coalesce(
            F.expr(where) if where is not None else F.lit(True), F.lit(False)
        )
        dec = dec.withColumn("_upd", upd)
        out_cols = []
        for c in tcols:
            col = (
                F.when(F.col("_upd"), F.expr(set_exprs[c])).otherwise(
                    F.col(c)
                )
                if c in set_exprs
                else F.col(c)
            ).cast(ttypes[c])
            if c == pcol:
                col = F.when(
                    F.col("_upd") & col.isNull(),
                    F.raise_error(
                        F.lit(
                            f"UPDATE: updated row has NULL partition "
                            f"column {pcol!r}"
                        )
                    ).cast("string"),
                ).otherwise(col).cast("string")
            out_cols.append(col.alias(c))
        dec = dec.select(
            *out_cols,
            F.col("_upd"),
            F.col(pcol).cast("string").alias("_t_part"),
            # pre-image carrier for the CDC sidecar (updated rows only)
            F.when(
                F.col("_upd"),
                F.struct(*[F.col(c) for c in tcols if c in lhave]),
            ).alias("_pre"),
        )

        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        cdc_stage = None
        try:
            dec = _materialize_decision(dec)

            rollup = (
                dec.groupBy("_upd", "_t_part", F.col(pcol).alias("_p"))
                .count()
                .collect()
            )
            n_upd = n_carry = 0
            upd_old, upd_new = set(), set()
            for r in rollup:
                if r._upd:
                    n_upd += r["count"]
                    upd_old.add(r._t_part)
                    upd_new.add(r._p)
                else:
                    n_carry += r["count"]
            if not n_upd:
                return {
                    "version": cur["version"], "updated": 0,
                    "carried": n_carry,
                }
            # departures and scanned arrivals rewrite; arrivals into
            # UNSCANNED partitions extend with just the moved rows
            rewrite_vals = upd_old | (upd_new & scanned_vals)
            extend_vals = upd_new - scanned_vals
            write_vals = sorted(rewrite_vals | extend_vals)
            # driver-known literal sets fold into the plan as isin
            # predicates (no tiny-createDataFrame broadcast job)
            _rw = (
                F.col(pcol).isin(sorted(rewrite_vals))
                if rewrite_vals
                else F.lit(False)
            )
            stage_rows = (
                dec.filter(F.col(pcol).isin(write_vals))
                .filter(_rw | F.col("_upd"))
                .drop("_upd", "_t_part", "_pre")
                # back to the stable PHYSICAL names for the staged files
                .select(*[F.col(c).alias(cmap.get(c, c)) for c in tcols])
            )
            _distribute_for_partitioned_write(
                stage_rows, pcol, nvals=len(write_vals)
            ).write.mode("overwrite").partitionBy(pcol).parquet(
                stage_path
            )
            written = {
                n for n in os.listdir(stage_path) if n.startswith(prefix)
            }
            _check_entry_values(written)
            if cur.get("constraints") and written:
                _enforce_constraints(
                    _read_partition_map(
                        spark, table_dir,
                        {
                            "partition_col": pcol,
                            "partitions": {e: stage for e in sorted(written)},
                            "dir_schemas": {
                                stage: _file_schema_json(
                                    stage_rows.schema, drop=pcol
                                )
                            },
                        },
                    ),
                    cur["constraints"],
                    stage_path,
                    manifest=cur,
                )

            if change_data:
                # same sidecar contract as MERGE: exact pre/post pairs,
                # carried rows absent; the sidecar stores PHYSICAL
                # names so the feeds' one end-projection is uniform
                pre_fields, cur_fields, _img = _cdc_image_parts(
                    tcols, ttypes, lhave
                )
                cdc_rows = (
                    dec.filter(F.col("_upd"))
                    .select(
                        F.explode(
                            F.array(
                                _img(pre_fields, "update_preimage"),
                                _img(cur_fields, "update_postimage"),
                            )
                        ).alias("_c")
                    )
                    .select("_c.*")
                    .select(
                        *[F.col(c).alias(cmap.get(c, c)) for c in tcols],
                        F.col("_change_type"),
                    )
                )
                cdc_stage = f"cdc-{uuid.uuid4().hex}"
                cdc_rows.write.mode("overwrite").parquet(
                    os.path.join(table_dir, cdc_stage)
                )

            new_parts = dict(cur["partitions"])
            for v in rewrite_vals:
                new_parts.pop(f"{prefix}{v}", None)
            for e in written:
                v = e.split("=", 1)[1]
                if v in extend_vals and e in cur["partitions"]:
                    new_parts[e] = _entry_dirs(cur["partitions"][e]) + [stage]
                else:
                    new_parts[e] = stage
            new_stats, new_bloom = _carry_stats_blooms(
                cur, written, new_parts, extend_vals, stage_path, stats_cols
            )
            manifest = {
                "version": cur["version"] + 1,
                "dir": stage,
                "partition_col": pcol,
                "partitions": new_parts,
                "batch_ids": [batch_id] if batch_id is not None else [],
                "op": "update",
            }
            if new_stats:
                manifest["stats"] = new_stats
            if new_bloom:
                manifest["bloom"] = new_bloom
            if cur.get("constraints"):
                manifest["constraints"] = cur["constraints"]
            _carry_column_map(manifest, cur)
            if cur.get("dv"):
                manifest["dv"] = cur["dv"]
                manifest["dv_key"] = cur["dv_key"]
            if cdc_stage:
                manifest["cdc"] = cdc_stage
            _note_dir_schemas(
                manifest,
                cur,
                {
                    stage: (
                        _file_schema_json(stage_rows.schema, drop=pcol)
                        if written
                        else None
                    ),
                    (cdc_stage or ""): (
                        _file_schema_json(cdc_rows.schema)
                        if cdc_stage
                        else None
                    ),
                },
            )
            if _publish(table_dir, manifest, stage_path):
                return {
                    "version": manifest["version"], "updated": n_upd,
                    "carried": n_carry,
                }
            # CAS lost: re-run against the winner
            shutil.rmtree(stage_path, ignore_errors=True)
            if cdc_stage:
                shutil.rmtree(
                    os.path.join(table_dir, cdc_stage), ignore_errors=True
                )
        finally:
            dec.unpersist()
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
    )


def delete_table(
    spark: SparkSession,
    table_dir: str,
    where: str,
    stats_cols: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    prune: dict | None = None,
    partition_values: list[str] | None = None,
    change_data: bool = True,
) -> dict:
    """First-class predicate DELETE on a partition-mapped table — the
    copy-on-write leg of the DML triad's DELETE (Delta's ``DELETE FROM
    ... WHERE``; the merge-on-read twin is `tombstone_keys`, which
    hides KEYS for O(deleted keys) write cost). ``where`` is a SQL
    predicate over the row; a NULL predicate means NOT matched (the row
    survives — Delta's rule), so there is no way to delete a row by
    accident through three-valued logic. The generalization of the J13
    erasure demo (`apply_erasure_rewrite`, reference consumer
    nshmdb/nshmdb.py:263-266): any predicate, any table, one commit.

    Partition economics mirror `update_table`'s: after ONE decision
    scan, only partitions holding ≥1 matched row rewrite (their
    survivors restage); a partition whose rows ALL matched simply
    leaves the manifest (no empty file is written — its old files
    remain readable history); every other partition's mapping carries
    forward byte-identical. Two narrowing hints bound the decision
    scan itself: ``prune`` (the manifest-stats spec of
    `read_keyed_table` — ranges/null through stats, ``("eq", v)``
    through stats AND Bloom bitmaps) carries the caller's contract
    that no row outside the surviving entries matches ``where``
    (exactly like a pruned read composed with its own filter), while
    ``partition_values`` is a SCOPE restriction — the delete applies
    only to those partitions, i.e. ``WHERE pcol IN (...) AND where``
    — the GDPR-erasure shape "delete these users from the partitions
    that hold personal data". Without either, the decision pass scans
    the table once — Delta's own default for un-narrowable
    predicates.

    Constraints are NOT re-enforced: survivors are a subset of already-
    committed rows and row-level CHECKs are closed under subset (the
    manifest still carries them forward). The base is read THROUGH the
    tombstones, so dv-hidden rows are never counted as deleted and
    never emit delete images; a rewritten partition physically purges
    them (state-identical — the dv carries forward for the untouched
    partitions that still need it).

    Commits tag ``op: "delete"`` and by default record each deleted
    row's full image in a ``cdc-*`` sidecar (Delta's ``_change_data``
    with ``_change_type = 'delete'``) — the typed feeds (batch
    `read_table_changes_typed` + the changeTypes stream) serve those
    exact images with zero reconstruction; ``change_data=False`` opts
    out and the feeds fall back to the map-diff pair images (a rewrite
    diff). Concurrency: the delete re-runs on CAS conflict; a disjoint
    concurrent append REBASES over a published delete exactly as over
    a merge (`_rebase_conflict` — the touched entries show up in the
    map diff). ``batch_id`` gives foreachBatch replay idempotence. On
    a column-mapped table the predicate/prune/stats names are LOGICAL;
    staged survivors and the sidecar keep the physical names.
    Returns ``{"version", "deleted", "carried"}``."""
    if where is None:
        raise ValueError(
            "delete_table needs an explicit WHERE (use 'true' to delete "
            "every row on purpose)"
        )
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] == 0 or "partitions" not in cur:
            raise ValueError(
                f"{table_dir} is not a partition-mapped committed table"
            )
        if cur.get("legacy_layouts"):
            raise ValueError(
                f"{table_dir} has unmigrated legacy partition layouts; a "
                "delete computed against the current layout would miss "
                "their rows — run migrate_legacy_layouts first"
            )
        if batch_id is not None and batch_id in committed_batch_ids(table_dir):
            return {"version": cur["version"], "deleted": 0, "carried": 0,
                    "replayed": True}
        pcol = cur["partition_col"]
        prefix = f"{pcol}="
        # column mapping (r12): decision frame in LOGICAL names,
        # translated back to the stable PHYSICAL names at the survivor
        # stage and the CDC sidecar (same contract as update_table); a
        # rewritten partition physically sheds dropped columns' data
        # (state-identical)
        cmap = _column_map(cur)
        base_prune, eq = _split_prune(_physical_names(prune, cur))
        scan_parts = dict(_stats_prune(cur, base_prune))
        if eq and scan_parts:
            scan_parts = dict(_bloom_prune(spark, cur, scan_parts, eq))
        if partition_values is not None:
            allowed = set(partition_values)
            scan_parts = {
                e: d
                for e, d in scan_parts.items()
                if e.split("=", 1)[1] in allowed
            }
        if not scan_parts:
            # every partition disproven/out of scope: O(manifest) no-op
            # without the full-footer mergeSchema resolve below (r12
            # review sweep 2 #6)
            return {"version": cur["version"], "deleted": 0, "carried": 0}

        # full-table LOGICAL schema (plan resolve, zero jobs) so a
        # pruned base missing evolved columns still projects them as
        # typed NULLs
        full = _to_logical(_read_partition_map(spark, table_dir, cur), cur)
        tcols = list(full.columns)
        ttypes = dict(zip(full.schema.names, [f.dataType for f in full.schema]))

        base = (
            _apply_tombstones(
                spark, table_dir, cur,
                _read_partition_map(
                    spark, table_dir,
                    {
                        "partition_col": pcol,
                        "partitions": scan_parts,
                        "dir_schemas": cur.get("dir_schemas") or {},
                    },
                ),
            )
            if scan_parts
            else None
        )
        if base is None:
            return {"version": cur["version"], "deleted": 0, "carried": 0}
        have = set(base.columns)  # PHYSICAL names on disk
        dec = base.select(
            *[
                (
                    F.col(cmap.get(c, c))
                    if cmap.get(c, c) in have
                    else F.lit(None).cast(ttypes[c])
                ).cast(ttypes[c]).alias(c)
                for c in tcols
            ]
        )
        # NULL predicate = not matched (Delta's DELETE rule)
        dec = dec.withColumn(
            "_del", F.coalesce(F.expr(where), F.lit(False))
        )

        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        cdc_stage = None
        try:
            # materialize the decision once: the rollup, the survivor
            # stage, and the CDC sidecar would otherwise each re-run
            # the scan (separate actions share no ReusedExchange)
            dec = _materialize_decision(dec)

            rollup = (
                dec.groupBy("_del", F.col(pcol).cast("string").alias("_p"))
                .count()
                .collect()
            )
            n_del = n_carry = 0
            del_vals = set()
            for r in rollup:
                if r._del:
                    n_del += r["count"]
                    del_vals.add(r._p)
                else:
                    n_carry += r["count"]
            if not n_del:
                return {
                    "version": cur["version"], "deleted": 0,
                    "carried": n_carry,
                }
            # ONLY partitions holding a matched row rewrite (survivors
            # restage); a fully-deleted partition writes nothing and
            # its entry drops from the map below
            # driver-known literal set folds into the plan as an isin
            # predicate (no tiny-createDataFrame broadcast job)
            stage_rows = (
                dec.filter(~F.col("_del"))
                .withColumn(pcol, F.col(pcol).cast("string"))
                .filter(F.col(pcol).isin(sorted(del_vals)))
                .drop("_del")
                # back to the stable PHYSICAL names for the staged files
                .select(*[F.col(c).alias(cmap.get(c, c)) for c in tcols])
            )
            _distribute_for_partitioned_write(
                stage_rows, pcol, nvals=len(del_vals)
            ).write.mode("overwrite").partitionBy(pcol).parquet(
                stage_path
            )
            written = {
                n for n in os.listdir(stage_path) if n.startswith(prefix)
            }
            _check_entry_values(written)

            if change_data:
                # Delta's _change_data for DELETE: one full-row image
                # per deleted row, tagged 'delete'; carried rows absent
                # sidecar stores PHYSICAL names (feeds end-project once)
                cdc_rows = dec.filter(F.col("_del")).select(
                    *[
                        F.col(c).cast(ttypes[c]).alias(cmap.get(c, c))
                        for c in tcols
                    ],
                    F.lit("delete").alias("_change_type"),
                )
                cdc_stage = f"cdc-{uuid.uuid4().hex}"
                cdc_rows.write.mode("overwrite").parquet(
                    os.path.join(table_dir, cdc_stage)
                )

            new_parts = dict(cur["partitions"])
            for v in del_vals:
                new_parts.pop(f"{prefix}{v}", None)
            for e in written:
                new_parts[e] = stage
            new_stats, new_bloom = _carry_stats_blooms(
                cur, written, new_parts, set(), stage_path, stats_cols
            )
            manifest = {
                "version": cur["version"] + 1,
                "dir": stage,
                "partition_col": pcol,
                "partitions": new_parts,
                "batch_ids": [batch_id] if batch_id is not None else [],
                "op": "delete",
            }
            if new_stats:
                manifest["stats"] = new_stats
            if new_bloom:
                manifest["bloom"] = new_bloom
            if cur.get("constraints"):
                manifest["constraints"] = cur["constraints"]
            _carry_column_map(manifest, cur)
            if cur.get("dv"):
                manifest["dv"] = cur["dv"]
                manifest["dv_key"] = cur["dv_key"]
            if cdc_stage:
                manifest["cdc"] = cdc_stage
            _note_dir_schemas(
                manifest,
                cur,
                {
                    stage: (
                        _file_schema_json(stage_rows.schema, drop=pcol)
                        if written
                        else None
                    ),
                    (cdc_stage or ""): (
                        _file_schema_json(cdc_rows.schema)
                        if cdc_stage
                        else None
                    ),
                },
            )
            if _publish(table_dir, manifest, stage_path):
                return {
                    "version": manifest["version"], "deleted": n_del,
                    "carried": n_carry,
                }
            # CAS lost: re-run against the winner
            shutil.rmtree(stage_path, ignore_errors=True)
            if cdc_stage:
                shutil.rmtree(
                    os.path.join(table_dir, cdc_stage), ignore_errors=True
                )
        finally:
            dec.unpersist()
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
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
    equal-order rows deterministic) is reduced first, then merged over
    the current table version inside a `committed_transaction`: staged
    to a unique data dir, CAS'd into the commit log (concurrent writers
    serialize via retry), batch id recorded — replayed batches no-op, so
    restart between write and checkpoint commit cannot double-apply.

    Scale shape: the per-batch reduce and the merge share the key
    partitioning (one shuffle each on `keys`); the rewrite cost is the
    TABLE size per batch — the COPY-ON-WRITE trade. The merge-on-read
    twin (`upsert_stream_to_table_mor`) moves that cost to the readers:
    O(batch) appends, one read-side window, periodic compaction — pick
    per workload exactly as you would between Delta COW and Hudi MOR.
    State lives in the table, not the state store, so the stream itself
    is stateless and unbounded keys are fine."""
    os.makedirs(table_dir, exist_ok=True)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak or []]
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        committed_transaction(
            batch_df.sparkSession,
            table_dir,
            lambda base: merge_into(base, latest, keys, order_col, tiebreak),
            batch_id=batch_id,
        )

    writer = df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_to_table(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    reduce_order_col: str | None = None,
    reduce_tiebreak: list[str] | None = None,
    trigger_available_now: bool = True,
    **merge_clauses,
) -> StreamingQuery:
    """Conditional multi-clause MERGE as a foreachBatch sink — the
    streaming CDC APPLY: every micro-batch applies the clause set
    (``merge_clauses`` pass straight through to `merge_into_table`:
    when_matched_update / _delete, when_not_matched_insert,
    by-source clauses, evolve_schema, stats_cols) as ONE commit with
    batch-id idempotence, so a replayed batch no-ops and a crash
    between write and checkpoint commit cannot double-apply.

    ``reduce_order_col`` (plus ``reduce_tiebreak``) pre-reduces each
    batch to the newest row per key first — a CDC feed can carry
    several changes for one key in one batch, and MERGE raises on
    multiple matched source rows. Without it the feed must already be
    unique per key per batch.

    The target table must exist (a merge into an empty table is an
    append — land the initial snapshot first). Batch-composition note:
    conditions referencing ``t`` evaluate against the table state AS
    OF each micro-batch, so the outcome is batch-sensitive unless the
    feed is per-key monotone (e.g. an order-column condition like
    ``s.ts >= t.ts``) or batches carry disjoint keys — the same
    contract as Delta's foreachBatch MERGE."""
    os.makedirs(table_dir, exist_ok=True)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        src = batch_df
        if reduce_order_col:
            w = Window.partitionBy(*keys).orderBy(
                F.col(reduce_order_col).desc(),
                *[F.col(c).desc() for c in reduce_tiebreak or []],
            )
            src = (
                src.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        merge_into_table(
            batch_df.sparkSession, table_dir, src, keys,
            batch_id=batch_id, **merge_clauses,
        )

    writer = df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def append_keyed_mor(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
    batch_id: int | None = None,
    max_retries: int = 10,
    max_open_generations: int | None = None,
) -> None:
    """MERGE-ON-READ upsert append: the batch's newest row per key lands
    as a NEW immutable generation (one manifest commit, O(batch) write —
    never a table rewrite), and `read_keyed_mor` resolves latest-per-key
    at read time. This is the Hudi-MOR / Delta deletion-vector trade the
    copy-on-write `upsert_stream_to_table` docstring promises a real
    format would make: hot write path pays O(batch), readers pay one
    window over the generations until `compact_keyed_mor` folds them.

    Each staged generation carries a literal `_gen` = its commit version
    so equal (order_col, tiebreak) values across generations resolve to
    the later COMMIT deterministically (update-wins, same contract as
    `merge_into`).

    ``max_open_generations`` is the Hudi-style compaction trigger,
    enforced at ENTRY (before the idempotence short-circuit, so a
    replayed batch still re-enforces the bound a crashed compaction
    left violated) and retried best-effort after a publish that
    crosses it — a post-publish compaction failure must not fail the
    caller's batch, whose data is already durably committed; the next
    append's entry-side trigger picks it up. Read amplification is
    thus bounded at N+1 generations over a stream's whole life at the
    cost of a periodic rewrite."""
    os.makedirs(table_dir, exist_ok=True)
    if max_open_generations is not None:
        head = current_commit(table_dir)
        if len(head.get("dirs", [])) > max_open_generations:
            compact_keyed_mor(spark, table_dir)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak or []]
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    for _ in range(max_retries):
        cur = current_commit(table_dir)
        if cur["version"] > 0 and "mor" not in cur:
            raise ValueError(f"{table_dir} is not a merge-on-read keyed table")
        if cur["version"] > 0:
            # the merge contract (keys/order/tiebreak) is a TABLE
            # property: a mismatched append would silently rewrite it in
            # the new head manifest and change how read_keyed_mor
            # resolves every PRIOR generation — reject instead.
            want = {
                "keys": keys,
                "order_col": order_col,
                "tiebreak": tiebreak or [],
            }
            if cur["mor"] != want:
                raise ValueError(
                    f"merge config mismatch for {table_dir}: table has "
                    f"{cur['mor']}, append supplied {want}"
                )
        if batch_id is not None and batch_id in committed_batch_ids(table_dir):
            return
        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        gen_df = latest.withColumn("_gen", F.lit(cur["version"] + 1))
        gen_df.write.mode("overwrite").parquet(stage_path)
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "dirs": cur.get("dirs", []) + [stage],
            "mor": {
                "keys": keys,
                "order_col": order_col,
                "tiebreak": tiebreak or [],
            },
            "batch_ids": [batch_id] if batch_id is not None else [],
        }
        _note_dir_schemas(
            manifest, cur, {stage: _file_schema_json(gen_df.schema)}
        )
        if _publish(table_dir, manifest, stage_path):
            if (
                max_open_generations is not None
                and len(manifest["dirs"]) > max_open_generations
            ):
                try:
                    compact_keyed_mor(spark, table_dir)
                except Exception:
                    # the append IS committed; failing the caller now
                    # would replay a durable batch. The bound is
                    # re-enforced by the next call's entry-side trigger.
                    pass
            return
    raise RuntimeError(
        f"commit conflict persisted for {max_retries} retries on {table_dir}"
    )


def read_keyed_mor(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame | None:
    """Latest-per-key view of a merge-on-read keyed table: ONE multi-path
    scan over the generation dirs (same schema throughout, so no union
    chain), one window keyed on the merge keys — the read-side merge.
    The window shuffle is on the key columns, the same exchange the
    copy-on-write merge paid PER BATCH at write time. ``as_of`` (epoch
    seconds) resolves TIMESTAMP AS OF exactly like read_keyed_table."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass either version or as_of, not both")
        version = resolve_version_as_of(table_dir, as_of)
        if version is None:
            return None
    if version is not None:
        cur = next(
            (m for m in table_history(table_dir) if m["version"] == version),
            None,
        )
        if cur is None:
            raise ValueError(f"version {version} not committed in {table_dir}")
    else:
        cur = current_commit(table_dir)
    if cur["version"] == 0:
        return None
    if "mor" not in cur:
        raise ValueError(f"{table_dir} is not a merge-on-read keyed table")
    mor = cur["mor"]
    df = _read_parquet_fast(
        spark,
        *[os.path.join(table_dir, d) for d in cur["dirs"]],
        schema_json=_dirs_schema(cur, cur["dirs"]),
    )
    w = Window.partitionBy(*mor["keys"]).orderBy(
        F.col(mor["order_col"]).desc(),
        *[F.col(c).desc() for c in mor["tiebreak"]],
        F.col("_gen").desc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_gen")
    )


def compact_keyed_mor(spark: SparkSession, table_dir: str) -> bool:
    """Fold a merge-on-read table's generations into one materialized
    latest-per-key dir (the compaction that moves the merge cost from
    every read back to one write) — published as a normal commit, so the
    un-compacted generations stay readable as history. Returns False if
    the table already has a single generation."""
    for _ in range(10):
        cur = current_commit(table_dir)
        if "mor" not in cur:
            raise ValueError(f"{table_dir} is not a merge-on-read keyed table")
        if len(cur["dirs"]) <= 1:
            return False
        merged = read_keyed_mor(spark, table_dir).withColumn(
            "_gen", F.lit(cur["version"] + 1)
        )
        stage = f"data-{uuid.uuid4().hex}"
        stage_path = os.path.join(table_dir, stage)
        merged.write.mode("overwrite").parquet(stage_path)
        manifest = {
            "version": cur["version"] + 1,
            "dir": stage,
            "dirs": [stage],
            "mor": cur["mor"],
            "batch_ids": [],
        }
        _note_dir_schemas(
            manifest, cur, {stage: _file_schema_json(merged.schema)}
        )
        if _publish(table_dir, manifest, stage_path):
            return True
    raise RuntimeError(f"commit conflict persisted on {table_dir}")


def upsert_stream_to_table_mor(
    df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
    trigger_available_now: bool = True,
    max_open_generations: int | None = None,
) -> StreamingQuery:
    """The merge-on-read twin of `upsert_stream_to_table`: each
    micro-batch appends its per-key-latest rows as a generation
    (`append_keyed_mor`, O(batch) write, batch-id idempotent) instead of
    rewriting the table; `read_keyed_mor` serves the merged view and
    `compact_keyed_mor` folds generations on a maintenance cadence —
    either explicitly, or inline whenever the open-generation count
    passes ``max_open_generations`` (the Hudi compaction trigger)."""

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_keyed_mor(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            keys,
            order_col,
            tiebreak,
            batch_id=batch_id,
            max_open_generations=max_open_generations,
        )

    writer = df.writeStream.foreachBatch(_append_batch).option(
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
    committed batch-id list (same `committed_transaction` protocol as
    upsert_stream_to_table) is what makes restart-between-write-and-
    checkpoint-commit safe, and the commit-log CAS is what keeps a
    concurrent second writer from double-adding the same partials.

    Scale shape: the per-batch partial is a map-side-combined shuffle
    whose width is the KEY CARDINALITY, not the batch row count; the
    merge re-aggregates table ∪ partials on the same keys. Table size is
    bounded by key cardinality, so the per-batch rewrite stays small even
    when the stream is unbounded — this is why hourly-rollup tables are
    maintainable where raw-event tables need a real table format."""
    os.makedirs(table_dir, exist_ok=True)

    def _rollup_batch(batch_df: DataFrame, batch_id: int) -> None:
        aggs = [F.count(F.lit(1)).cast("long").alias(count_col)] + [
            F.sum(c).alias(out) for c, out in sum_cols.items()
        ]
        partial = batch_df.groupBy(*keys).agg(*aggs)

        def _add(base: DataFrame | None) -> DataFrame:
            if base is None:
                return partial
            return (
                base.unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum(count_col).cast("long").alias(count_col),
                    *[F.sum(out).alias(out) for out in sum_cols.values()],
                )
            )

        committed_transaction(
            batch_df.sparkSession, table_dir, _add, batch_id=batch_id
        )

    writer = df.writeStream.foreachBatch(_rollup_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
