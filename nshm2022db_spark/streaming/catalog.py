"""Catalog-level ATOMIC multi-table publish.

A warehouse operation routinely spans tables — an inverted index is
postings + document frequencies + corpus size; a medallion hop rewrites
a fact AND its rollup — but per-table commit logs (this repo's, Delta's,
Iceberg's without a transactional catalog) only make each table
individually atomic: a reader between two commits observes table A's new
version next to table B's old one. The CATALOG closes that gap the way
Iceberg's REST/Nessie catalogs do, on the same CAS-log protocol every
table here already uses:

* per-table commits stay exactly as they are — each table's own log is
  still the source of truth for single-table readers;
* a catalog commit atomically re-points a SNAPSHOT VECTOR
  ``{name: (table_dir, version)}`` — one ``os.link`` CAS, so catalog
  readers switch from one CONSISTENT vector to the next and can never
  see a torn set;
* a writer that dies after its table commits but before the catalog CAS
  leaves newer per-table versions unreferenced: the catalog keeps
  serving the previous consistent vector (Iceberg's
  uncommitted-snapshot semantics, lifted to catalog scope), and the
  orphaned versions remain ordinary time-travel history;
* CAS losers RETRY on a fresh read of the catalog, re-applying only
  their own updates — publishers of DISJOINT table sets therefore
  both land (vector merge), the catalog analogue of the per-table
  rebase rule.

Scale shape: a catalog commit is one tiny JSON manifest naming
(dir, version) pairs — O(tables), independent of data size; reads
resolve through the pinned per-table versions' own manifests, so all
existing pruning (partition map, stats, Blooms, column maps) applies
unchanged. At 100 TB the catalog is the coordination point for
multi-table pipelines exactly because it never touches data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table
from nshm2022db_spark.streaming.sinks import (
    _COMMITS,
    _is_manifest,
    _read_json,
    try_commit,
)


def _catalog_manifest_names(catalog_dir: str) -> list[str]:
    """Sorted catalog manifest names — the SAME _is_manifest filter the
    per-table log scan uses, so a ledger checkpoint (*.checkpoint.json)
    landing in a catalog dir (or a catalog_dir pointed at a table dir)
    is never parsed as a snapshot vector (ADVICE r13)."""
    log = os.path.join(catalog_dir, _COMMITS)
    try:
        return sorted(n for n in os.listdir(log) if _is_manifest(n))
    except FileNotFoundError:
        return []


def current_catalog(catalog_dir: str) -> dict:
    """The latest committed catalog manifest
    ``{version, tables: {name: {dir, version}}}`` — version 0 with an
    empty vector before the first publish. Same append-only log scan
    as sinks.current_commit, built on the same primitives: manifests
    are linked fully-written (try_commit), so a missing file can only
    be a concurrent retention unlink of an OLDER name (_read_json's
    FileNotFoundError tolerance); anything else — corruption, IO
    faults — propagates instead of silently serving a stale vector."""
    log = os.path.join(catalog_dir, _COMMITS)
    for n in reversed(_catalog_manifest_names(catalog_dir)):
        m = _read_json(os.path.join(log, n))
        if m is not None:
            return m
    return {"version": 0, "tables": {}}


def catalog_publish(
    catalog_dir: str,
    updates: dict[str, tuple[str, int]],
    max_retries: int = 10,
) -> dict:
    """Atomically re-point the catalog's snapshot vector for the named
    tables: ``updates`` maps table name -> (table_dir, version) — the
    versions the caller just committed through the per-table logs.
    Unnamed tables carry forward; a CAS loser re-reads and re-applies
    ONLY its own updates, so concurrent publishers of disjoint sets
    both land. Returns the published manifest."""
    for _ in range(max_retries):
        cur = current_catalog(catalog_dir)
        tables = dict(cur.get("tables", {}))
        for name, (d, v) in updates.items():
            tables[name] = {"dir": os.path.abspath(d), "version": int(v)}
        m = {"version": cur["version"] + 1, "tables": tables}
        # the SAME os.link conditional-put every table's log uses —
        # the catalog is just one more CAS log (sinks.try_commit)
        if try_commit(catalog_dir, m):
            return m
    raise RuntimeError(
        f"catalog_publish lost the CAS {max_retries} times in {catalog_dir}"
    )


def catalog_at(
    catalog_dir: str,
    version: int | None = None,
    as_of: float | None = None,
) -> dict:
    """Catalog TIME TRAVEL: the snapshot vector as of a past catalog
    ``version`` or wall-clock instant (``as_of``, epoch seconds against
    each manifest's ``committed_at``) — the catalog-level AS OF an
    Iceberg REST/Nessie catalog serves, and what a 100 TB lakehouse
    reader uses for a REPRODUCIBLE multi-table training snapshot: one
    historical vector, every table at the version that was live
    together.

    Retention is the boundary, same contract as per-table time travel:
    a version ``catalog_vacuum`` retired REFUSES (ValueError) rather
    than silently serving a neighbor — the retained manifests tell us
    exactly whether the requested instant predates the earliest one.
    Version 0 / an instant before the first publish resolve to the
    empty pre-publish vector only when version 1 is still retained
    (i.e. nothing was vacuumed out from under the request).

    O(manifests): resolves purely on the tiny JSON log, no data read;
    the returned vector feeds ``read_catalog_table(snapshot=...)`` so
    all per-table pruning applies unchanged."""
    if (version is None) == (as_of is None):
        raise ValueError("pass exactly one of version / as_of")
    log = os.path.join(catalog_dir, _COMMITS)
    names = _catalog_manifest_names(catalog_dir)
    earliest = int(names[0].split(".")[0]) if names else 1
    head = int(names[-1].split(".")[0]) if names else 0
    if version is not None:
        if version == 0 and earliest <= 1:
            return {"version": 0, "tables": {}}
        if version < earliest:
            raise ValueError(
                f"catalog version {version} was vacuumed from {catalog_dir}; "
                f"earliest retained is {earliest}"
            )
        if version > head:
            raise ValueError(
                f"catalog version {version} not committed yet in "
                f"{catalog_dir}; head is {head}"
            )
        m = _read_json(os.path.join(log, f"{version:020d}.json"))
        if m is None:  # unlinked by a concurrent vacuum after our listing
            raise ValueError(
                f"catalog version {version} was vacuumed from {catalog_dir}"
            )
        return m
    best = None
    for n in names:
        m = _read_json(os.path.join(log, n))
        if m is None:
            continue
        ts = m.get("committed_at")
        if ts is not None and ts <= as_of:
            best = m if best is None or m["version"] > best["version"] else best
    if best is not None:
        return best
    if earliest <= 1:
        return {"version": 0, "tables": {}}  # instant predates first publish
    raise ValueError(
        f"catalog state as of {as_of} was vacuumed from {catalog_dir}; "
        f"earliest retained version is {earliest}"
    )


def read_catalog_table(
    spark: SparkSession,
    catalog_dir: str,
    name: str,
    snapshot: dict | None = None,
    catalog_version: int | None = None,
    catalog_as_of: float | None = None,
) -> DataFrame | None:
    """Read a table AT the catalog's pinned version (None if the catalog
    doesn't reference it). Pass ``snapshot`` (a ``current_catalog`` /
    ``catalog_at`` result) to read SEVERAL tables from ONE consistent
    vector while publishers race — grabbing the snapshot once is the
    whole point. ``catalog_version`` / ``catalog_as_of`` are shorthand
    for ``snapshot=catalog_at(...)``: a single-table historical read
    through the catalog's own time travel."""
    from nshm2022db_spark.streaming.sinks import read_keyed_table

    if sum(x is not None for x in (snapshot, catalog_version, catalog_as_of)) > 1:
        raise ValueError(
            "pass at most one of snapshot / catalog_version / catalog_as_of"
        )
    if catalog_version is not None or catalog_as_of is not None:
        snapshot = catalog_at(
            catalog_dir, version=catalog_version, as_of=catalog_as_of
        )
    cur = snapshot if snapshot is not None else current_catalog(catalog_dir)
    ent = cur.get("tables", {}).get(name)
    if ent is None:
        return None
    return read_keyed_table(spark, ent["dir"], version=ent["version"])


def catalog_rollback(catalog_dir: str, version: int, max_retries: int = 10) -> dict:
    """Iceberg-style catalog ROLLBACK: re-publish the snapshot vector of
    a retained historical version as the NEW head — a forward commit,
    never a rewrite, so the botched publishes stay in history (auditable,
    still time-travelable) while every catalog reader atomically snaps
    back to the known-good multi-table state. Resolves through
    ``catalog_at`` and therefore refuses past the vacuum boundary. The
    CAS loop is ``catalog_publish``'s: a concurrent publisher can slip
    in, and the rollback REPLACES the whole vector (unlike publish's
    merge) because restoring a consistent past state is the point.
    Returns the published manifest."""
    target = dict(catalog_at(catalog_dir, version=version).get("tables", {}))
    for _ in range(max_retries):
        cur = current_catalog(catalog_dir)
        m = {"version": cur["version"] + 1, "tables": dict(target)}
        if try_commit(catalog_dir, m):
            return m
    raise RuntimeError(
        f"catalog_rollback lost the CAS {max_retries} times in {catalog_dir}"
    )


def catalog_vacuum(catalog_dir: str, keep_last_snapshots: int = 1) -> dict:
    """Catalog-driven retention — the loop-closer for the orphaned
    versions atomic publish leaves behind: protect, for every table the
    last ``keep_last_snapshots`` catalog snapshots reference, the PINNED
    versions and everything newer (an in-flight writer's commits land at
    the head and must survive), then vacuum each table's older history
    through the table's own ``vacuum_versions`` (which already handles
    shared data dirs, clone reference safety, and batch-id ledger
    preservation). Catalog manifests older than the protected window
    retire with the same unlink discipline — the newest is never
    touched. Tables the protected snapshots do NOT reference are left
    alone entirely: the catalog only ever reclaims history it pins.

    Returns ``{"tables": {dir: vacuum report}, "catalog_versions":
    [...]}``. Cost is O(manifests) — no data is read; deletion is the
    table vacuum's own data-dir reclaim."""
    from nshm2022db_spark.streaming.sinks import vacuum_versions

    if keep_last_snapshots < 1:
        raise ValueError("keep_last_snapshots must be >= 1")
    log = os.path.join(catalog_dir, _COMMITS)
    names = _catalog_manifest_names(catalog_dir)
    protected_names = names[-keep_last_snapshots:]
    pins: dict[str, int] = {}
    for n in protected_names:
        m = _read_json(os.path.join(log, n))
        if m is None:
            continue
        for ent in m.get("tables", {}).values():
            d, v = ent["dir"], int(ent["version"])
            pins[d] = min(pins.get(d, v), v)
    reports = {}
    for d, min_pin in pins.items():
        # protect BY VERSION inside the vacuum's own single history
        # read — a commit landing between our pin computation and the
        # vacuum can only add newer (still-protected) versions, never
        # shift a count window over the pinned one (ADVICE r13)
        reports[d] = vacuum_versions(d, 1, keep_from_version=min_pin)
    dropped = []
    for n in names[:-keep_last_snapshots]:
        try:
            os.unlink(os.path.join(log, n))
            dropped.append(int(n.split(".")[0]))
        except FileNotFoundError:
            pass
    return {"tables": reports, "catalog_versions": dropped}


# ---------------------------------------------------------------------------
# Registered proof query
# ---------------------------------------------------------------------------

_CATALOG_ORACLE = """
    SELECT event_type,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           COUNT(*) AS n,
           TRUE AS initial_consistent,
           TRUE AS mid_crash_consistent,
           TRUE AS final_consistent
    FROM events GROUP BY event_type
"""


def _vector_consistent(
    spark: SparkSession, catalog_dir: str, snapshot: dict | None = None
) -> bool:
    """The cross-table invariant of the proof pair: the totals table's
    grand sums equal the rollup table's column sums — true only when
    the catalog serves BOTH tables from the same publish."""
    snap = snapshot if snapshot is not None else current_catalog(catalog_dir)
    x = read_catalog_table(spark, catalog_dir, "by_type", snapshot=snap)
    y = read_catalog_table(spark, catalog_dir, "totals", snapshot=snap)
    xs = x.agg(
        F.sum("id_sum").alias("id_sum"), F.sum("n").alias("n")
    ).collect()[0]
    ys = y.collect()[0]
    return (xs["id_sum"], xs["n"]) == (ys["id_sum"], ys["n"])


@register("catalog_atomic_publish", _CATALOG_ORACLE)
def catalog_atomic_publish(spark: SparkSession, sf: str) -> DataFrame:
    """Atomic multi-table publish, proven mid-flight: a per-event_type
    rollup table and a 1-row grand-totals table must always agree
    (SUM over one == the other — a torn read breaks it). The flow:

    1. build both from HALF the events, commit each, catalog-publish
       v1 — the catalog read is consistent (``initial_consistent``);
    2. commit the FULL rollup to the by_type table and CRASH before
       the catalog publish — a direct table read now sees the new
       version, but the catalog still serves the OLD CONSISTENT pair
       (``mid_crash_consistent``: the invariant holds AND the catalog
       demonstrably pins the pre-crash version);
    3. commit the full totals and catalog-publish both — the catalog
       flips to the new consistent vector in one CAS
       (``final_consistent``), and the rollup it serves is the oracle's
       full-corpus answer.

    The three booleans are bounded scalar checks (1-row aggregates of
    the two proof tables — the sanctioned driver-side scalar budget);
    the returned rollup itself stays distributed. Per-call scratch is
    reaped (the protocol re-runs by design — its cost IS the measured
    thing, same family as commit_rebase_stats)."""
    from nshm2022db_spark.streaming.events import _reap_scratch
    from nshm2022db_spark.streaming.sinks import (
        current_commit,
        overwrite_partition_transaction,
    )

    events = read_table(spark, sf, "events").select(
        "event_id", "event_type", (F.col("event_id") % 2 == 0).alias("half")
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.sum("event_id").cast("long").alias("id_sum"),
            F.count(F.lit(1)).alias("n"),
        )

    def totals(df: DataFrame) -> DataFrame:
        return df.agg(
            F.sum("event_id").cast("long").alias("id_sum"),
            F.count(F.lit(1)).alias("n"),
        ).withColumn("pk", F.lit(0))

    cat = tempfile.mkdtemp(prefix="catalog_")
    x_dir = os.path.join(cat, "by_type")
    y_dir = os.path.join(cat, "totals")

    # stage 1: consistent v1 pair from half the corpus, published atomically
    half = events.filter("half")
    overwrite_partition_transaction(spark, x_dir, "event_type", rollup(half))
    overwrite_partition_transaction(spark, y_dir, "pk", totals(half))
    catalog_publish(
        cat,
        {
            "by_type": (x_dir, current_commit(x_dir)["version"]),
            "totals": (y_dir, current_commit(y_dir)["version"]),
        },
    )
    initial_ok = _vector_consistent(spark, cat)
    pinned_x = current_catalog(cat)["tables"]["by_type"]["version"]

    # stage 2: the by_type table advances; the writer "crashes" before
    # the catalog publish — the catalog must keep serving the old pair
    overwrite_partition_transaction(spark, x_dir, "event_type", rollup(events))
    mid_ok = (
        _vector_consistent(spark, cat)
        and current_catalog(cat)["tables"]["by_type"]["version"] == pinned_x
        and current_commit(x_dir)["version"] > pinned_x
    )

    # stage 3: finish the pair and flip the catalog in one CAS
    overwrite_partition_transaction(spark, y_dir, "pk", totals(events))
    catalog_publish(
        cat,
        {
            "by_type": (x_dir, current_commit(x_dir)["version"]),
            "totals": (y_dir, current_commit(y_dir)["version"]),
        },
    )
    final_ok = _vector_consistent(spark, cat)

    out = read_catalog_table(spark, cat, "by_type").select(
        "event_type",
        "id_sum",
        "n",
        F.lit(initial_ok).alias("initial_consistent"),
        F.lit(mid_ok).alias("mid_crash_consistent"),
        F.lit(final_ok).alias("final_consistent"),
    )
    return _reap_scratch(out, spark, cat)


_TIME_TRAVEL_ORACLE = """
    SELECT event_type,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           COUNT(*) AS n,
           TRUE AS historical_consistent,
           TRUE AS head_consistent,
           TRUE AS head_advanced
    FROM events WHERE event_id % 2 = 0 GROUP BY event_type
"""


@register("catalog_time_travel", _TIME_TRAVEL_ORACLE)
def catalog_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Catalog-level AS OF: the multi-table snapshot vector of a PAST
    publish stays readable — and stays CONSISTENT — while the head
    moves on. The reproducible-training-snapshot flow at 100 TB: pin
    catalog version N once, and every table read through that vector is
    the exact set that was live together, no matter how many publishes
    land afterwards.

    1. publish v1: rollup + grand-totals pair built from HALF the
       events (same cross-table invariant as catalog_atomic_publish);
    2. advance BOTH tables to the full corpus and publish v2 — the
       head vector now serves the full answer;
    3. ``catalog_at(version=1)`` resolves the RETIRED-from-head vector:
       the historical pair must still agree with each other AND the
       same instant must resolve by TIMESTAMP (``as_of`` between the
       two publishes → version 1) — ``historical_consistent``;
    4. the head read stays consistent (``head_consistent``) and
       demonstrably moved past the pinned versions (``head_advanced``).

    The RETURNED rollup is the v1 historical read itself, so the oracle
    (half-corpus GROUP BY) hash-pins that time travel serves the OLD
    data, not a relabeled head. Booleans are bounded scalar checks; the
    rollup stays distributed. Vacuum-boundary refusal (reads past
    ``catalog_vacuum`` raise) is pinned in tests/test_catalog.py —
    exercising retention here would delete the history the oracle
    reads."""
    import time as _time

    from nshm2022db_spark.streaming.events import _reap_scratch
    from nshm2022db_spark.streaming.sinks import (
        current_commit,
        overwrite_partition_transaction,
    )

    events = read_table(spark, sf, "events").select(
        "event_id", "event_type", (F.col("event_id") % 2 == 0).alias("half")
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.sum("event_id").cast("long").alias("id_sum"),
            F.count(F.lit(1)).alias("n"),
        )

    def totals(df: DataFrame) -> DataFrame:
        return df.agg(
            F.sum("event_id").cast("long").alias("id_sum"),
            F.count(F.lit(1)).alias("n"),
        ).withColumn("pk", F.lit(0))

    cat = tempfile.mkdtemp(prefix="catalog_tt_")
    x_dir = os.path.join(cat, "by_type")
    y_dir = os.path.join(cat, "totals")

    half = events.filter("half")
    overwrite_partition_transaction(spark, x_dir, "event_type", rollup(half))
    overwrite_partition_transaction(spark, y_dir, "pk", totals(half))
    catalog_publish(
        cat,
        {
            "by_type": (x_dir, current_commit(x_dir)["version"]),
            "totals": (y_dir, current_commit(y_dir)["version"]),
        },
    )
    t_between = _time.time()  # an instant when v1 was the live vector
    v1_pins = {
        n: e["version"] for n, e in current_catalog(cat)["tables"].items()
    }

    overwrite_partition_transaction(spark, x_dir, "event_type", rollup(events))
    overwrite_partition_transaction(spark, y_dir, "pk", totals(events))
    catalog_publish(
        cat,
        {
            "by_type": (x_dir, current_commit(x_dir)["version"]),
            "totals": (y_dir, current_commit(y_dir)["version"]),
        },
    )

    hist = catalog_at(cat, version=1)
    hist_ok = (
        _vector_consistent(spark, cat, snapshot=hist)
        and hist["tables"]["by_type"]["version"] == v1_pins["by_type"]
        and catalog_at(cat, as_of=t_between)["version"] == 1
    )
    head = current_catalog(cat)
    head_ok = _vector_consistent(spark, cat, snapshot=head)
    advanced = head["version"] == 2 and all(
        head["tables"][n]["version"] > v for n, v in v1_pins.items()
    )

    out = read_catalog_table(spark, cat, "by_type", snapshot=hist).select(
        "event_type",
        "id_sum",
        "n",
        F.lit(hist_ok).alias("historical_consistent"),
        F.lit(head_ok).alias("head_consistent"),
        F.lit(advanced).alias("head_advanced"),
    )
    return _reap_scratch(out, spark, cat)
