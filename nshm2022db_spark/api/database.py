"""NSHMDB — the reference's public API (nshmdb/nshmdb.py:84-683) over a
directory of Parquet tables, one Spark engine for every path.

Differences from the reference, all deliberate and documented:
  * one engine — no SQLite/DuckDB split (nshmdb.py:655 re-attaches the
    SQLite file to DuckDB for the one analytical query);
  * `query()` runs as ONE job: membership agg + geometry via
    collect_list(struct) — the reference issues one extra SQL round trip
    per result rupture (N+1, nshmdb.py:663-683);
  * `get_rupture_fault_info` filters on BOTH fault_system and nshm_id —
    the reference omits fault_system (nshmdb.py:589) and is ambiguous
    across systems since the natural key is only unique per system
    (schema.sql:47);
  * geometry stays in WGS84 lat/lon + depth km. The reference converts to
    the NZTM projected CRS on read through an external geodesy package
    (nshmdb.py:414,564); projection here is a pluggable hook
    (``projection=`` callable) rather than a hard dependency.

Scale: every dimension (fault, parent_fault, fault_plane) broadcasts;
point lookups are parquet scans with pushed natural-key predicates; at
100 TB partition the fact tables by fault_system for partition pruning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark import schemas
from nshm2022db_spark.operators import dense_surrogate_keys, upsert_missing
from nshm2022db_spark.plans.advanced_query import AdvancedQueryTables, advanced_query

# corner order matches the reference plane layout (schema.sql:22-31)
_CORNERS = ("top_left", "top_right", "bottom_right", "bottom_left")


@dataclass
class Plane:
    """A fault plane: 4×3 corner array [[lat, lon, depth_km] × 4]
    (reference: source_modelling Plane, constructed at nshmdb.py:406-415)."""

    corners: np.ndarray


@dataclass
class Fault:
    """A fault: list of planes (reference construction nshmdb.py:391-415)."""

    planes: list[Plane]

    @property
    def corners(self) -> np.ndarray:
        return np.vstack([p.corners for p in self.planes])


@dataclass
class FaultInfo:
    """reference: nshmdb.py:61-79"""

    fault_system: int
    fault_nshm_id: int
    name: str
    rake: float
    tect_type: int | None
    fault: Fault | None = None


@dataclass
class Rupture:
    """reference: nshmdb.py:40-58"""

    fault_system: int
    rupture_nshm_id: int
    magnitude: float | None
    area: float | None
    length: float | None
    rate: float | None
    faults: dict[str, Fault] = field(default_factory=dict)


def _planes_from_rows(rows) -> list[tuple[str, Plane]]:
    out = []
    for r in rows:
        corners = np.array(
            [
                [r[f"{c}_lat"], r[f"{c}_lon"], r["top_depth" if c.startswith("top") else "bottom_depth"]]
                for c in _CORNERS
            ]
        )
        out.append((r["name"], Plane(corners)))
    return out


class NSHMDB:
    """Parquet-directory database with the reference's method surface."""

    # fact tables partitioned by fault_system when partition_facts=True:
    # natural-key lookups and per-system queries then prune 2/3 of the
    # data at the file-listing level (SURVEY §1.4 / §4 scale note)
    _PARTITIONED = ("fault", "rupture")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        projection: Callable[[np.ndarray], np.ndarray] | None = None,
        partition_facts: bool = False,
    ):
        self.spark = spark
        self.path = path
        # hook for WGS→projected-CRS conversion (reference applies NZTM on
        # read, nshmdb.py:414,564); identity by default
        self.projection = projection
        self.partition_facts = partition_facts

    # -- lifecycle (reference: create/with-context, nshmdb.py:104-163) ------

    @classmethod
    def create(cls, spark: SparkSession, path: str, **kw) -> "NSHMDB":
        """Idempotently materialize the 6-table schema (CREATE TABLE IF NOT
        EXISTS, schema.sql applied at nshmdb.py:104-117)."""
        db = cls(spark, path, **kw)
        os.makedirs(path, exist_ok=True)
        for name, schema in schemas.NSHM_TABLES.items():
            if not os.path.exists(db._table_path(name)):
                if db._partition_cols(name):
                    # partitioned layout: an empty dir IS the empty table
                    os.makedirs(db._table_path(name), exist_ok=True)
                else:
                    spark.createDataFrame([], schema).write.parquet(
                        db._table_path(name)
                    )
        return db

    def _table_path(self, name: str) -> str:
        return os.path.join(self.path, f"{name}.parquet")

    def _partition_cols(self, name: str) -> list[str]:
        if self.partition_facts and name in self._PARTITIONED:
            return ["fault_system"]
        return []

    def table(self, name: str) -> DataFrame:
        return self.spark.read.schema(schemas.NSHM_TABLES[name]).parquet(
            self._table_path(name)
        )

    def _append(self, name: str, df: DataFrame) -> None:
        writer = df.select(
            *[F.col(f.name).cast(f.dataType) for f in schemas.NSHM_TABLES[name].fields]
        ).write.mode("append")
        pcols = self._partition_cols(name)
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(self._table_path(name))

    # -- inserts (reference: nshmdb.py:250-366,452-468) ----------------------

    def insert_parent_faults(self, names: DataFrame) -> None:
        """Upsert parent-fault names (INSERT OR IGNORE, nshmdb.py:263-266):
        anti-join against existing, windowed dense keys from MAX(id)."""
        existing = self.table("parent_fault")
        fresh = upsert_missing(names.select("name").distinct(), existing, ["name"])
        offset = existing.agg(F.coalesce(F.max("parent_id"), F.lit(0))).collect()[0][0]
        self._append(
            "parent_fault",
            dense_surrogate_keys(fresh, ["name"], "parent_id", offset=int(offset)),
        )

    def insert(self, name: str, df: DataFrame) -> None:
        """Bulk append (executemany / to_sql(if_exists='append'),
        nshmdb.py:263-308); natural-key duplicates are the caller's
        contract, as in the reference."""
        self._append(name, df)

    def insert_many_faults(self, faults: list[FaultInfo]) -> None:
        """Bulk fault + geometry insert (reference nshmdb.py:250-311):
        upsert parent names, assign dense surrogate fault_ids from
        MAX(fault_id)+1 in list order, flatten each plane's 4 corners to
        the fault_plane row layout.

        Deviation from the reference (documented): first fault_id is
        MAX+1 even on an empty table (reference starts at 0 only when
        empty, nshmdb.py:272) — parent_fault keys already start at 1 here,
        so both surrogate families are consistently 1-based."""
        spark = self.spark
        self.insert_parent_faults(
            spark.createDataFrame([(f.name,) for f in faults], "name string")
        )
        parent_ids = {
            r["name"]: r["parent_id"] for r in self.table("parent_fault").collect()
        }
        offset = int(
            self.table("fault")
            .agg(F.coalesce(F.max("fault_id"), F.lit(0)))
            .collect()[0][0]
        )

        fault_rows, plane_rows = [], []
        for i, f in enumerate(faults):
            fid = offset + 1 + i
            fault_rows.append(
                (fid, f.fault_nshm_id, f.fault_system, f.rake, f.tect_type,
                 parent_ids[f.name])
            )
            for plane in (f.fault.planes if f.fault else []):
                c = plane.corners
                plane_rows.append(
                    tuple(float(c[j][k]) for j in range(4) for k in (0, 1))
                    + (float(c[0][2]), float(c[2][2]), fid, len(plane_rows))
                )
        self._append(
            "fault",
            spark.createDataFrame(fault_rows, schemas.NSHM_TABLES["fault"]),
        )
        if plane_rows:
            corner_cols = [
                f"{c}_{ax}"
                for c in _CORNERS
                for ax in ("lat", "lon")
            ]
            schema_str = (
                ", ".join(f"{c} double" for c in corner_cols)
                + ", top_depth double, bottom_depth double"
                + ", fault_id long, __seq long"
            )
            planes = spark.createDataFrame(plane_rows, schema_str)
            existing_max = int(
                self.table("fault_plane")
                .agg(F.coalesce(F.max("plane_id"), F.lit(0)))
                .collect()[0][0]
            )
            self._append(
                "fault_plane",
                dense_surrogate_keys(
                    planes, ["__seq"], "plane_id", offset=existing_max
                ).drop("__seq"),
            )

    @staticmethod
    def _assert_resolved(df: DataFrame, id_cols: list[str], what: str) -> DataFrame:
        """Fail loudly if any natural key failed to resolve to a surrogate
        (NULL id after the left join). The reference's dict-lookup merge
        surfaces a missing key as a KeyError; the join-based resolution
        would otherwise append NULL ids that point lookups silently drop.
        One cheap aggregate per ingest batch."""
        cond = None
        for c in id_cols:
            term = F.col(c).isNull()
            cond = term if cond is None else (cond | term)
        n_bad = df.filter(cond).count()
        if n_bad:
            raise ValueError(
                f"{what}: {n_bad} rows reference natural keys not present in "
                f"the target tables (NULL {id_cols} after resolution); "
                "insert the referenced faults/ruptures first"
            )
        return df

    def _resolve_fault_ids(self, df: DataFrame) -> DataFrame:
        """Natural (fault_system, fault_nshm_id) → surrogate fault_id
        broadcast left join (reference left-merge, nshmdb.py:313-322)."""
        idmap = self.table("fault").select(
            "fault_system", F.col("nshm_id").alias("fault_nshm_id"), "fault_id"
        )
        return df.join(F.broadcast(idmap), ["fault_system", "fault_nshm_id"], "left")

    def _resolve_rupture_ids(self, df: DataFrame) -> DataFrame:
        """Natural (fault_system, rupture_nshm_id) → surrogate rupture_id
        (reference nshmdb.py:324-334)."""
        idmap = self.table("rupture").select(
            "fault_system", F.col("nshm_id").alias("rupture_nshm_id"), "rupture_id"
        )
        return df.join(F.broadcast(idmap), ["fault_system", "rupture_nshm_id"], "left")

    def insert_many_ruptures(
        self, ruptures: DataFrame, rupture_faults: DataFrame
    ) -> None:
        """Bulk rupture + bridge insert (reference nshmdb.py:336-366).

        ``ruptures``: columns (nshm_id, fault_system, magnitude, area,
        len, rate). ``rupture_faults``: NATURAL keys — (rupture_nshm_id,
        fault_nshm_id, fault_system) — resolved to surrogates via the two
        broadcast id-map joins before the bridge append."""
        offset = int(
            self.table("rupture")
            .agg(F.coalesce(F.max("rupture_id"), F.lit(0)))
            .collect()[0][0]
        )
        self._append(
            "rupture",
            dense_surrogate_keys(
                ruptures, ["fault_system", "nshm_id"], "rupture_id", offset=offset
            ),
        )
        bridge = self._assert_resolved(
            self._resolve_rupture_ids(self._resolve_fault_ids(rupture_faults)),
            ["rupture_id", "fault_id"],
            "insert_many_ruptures bridge",
        )
        b_offset = int(
            self.table("rupture_faults")
            .agg(F.coalesce(F.max("rupture_fault_id"), F.lit(0)))
            .collect()[0][0]
        )
        self._append(
            "rupture_faults",
            dense_surrogate_keys(
                bridge.select("rupture_id", "fault_id"),
                ["rupture_id", "fault_id"],
                "rupture_fault_id",
                offset=b_offset,
            ),
        )

    def insert_solution(
        self,
        sol: dict,
        include_faults: bool = True,
        include_ruptures: bool = True,
        include_mfds: bool = True,
    ) -> None:
        """Ingest a composite solution (sources.nshm_api.composite_solution
        output) END-TO-END as DataFrames — the distributed twin of the
        reference's driver-side object pipeline (api.py:595-622 →
        nshmdb.py:250-366,452-468). Nothing but the tiny parent-name and
        id maps ever reaches the driver; plane construction runs as a
        shuffle-free mapInPandas over the trace partitions.

        ``sol`` keys: faults (fault_nshm_id, name, rake, dip, dip_dir,
        top_depth, bottom_depth, trace, fault_system),
        rupture_properties (nshm_id, magnitude, area, len, rate,
        fault_system), rupture_join_table (rupture_id, fault_id —
        NATURAL ids — fault_system), magnitude_frequency_distribution
        (nshm_id, magnitude, rate, fault_system) or None.

        The three include_* flags mirror the reference CLI's
        --skip-*-creation options (scripts/nshm_db_generator.py:57-59);
        as there, skipping faults while inserting ruptures only works
        against a database that already has the faults (unresolvable
        bridge keys raise via _assert_resolved)."""
        from nshm2022db_spark.functions.geo import traces_to_planes
        faults = sol["faults"]
        if not include_faults:
            if include_ruptures:
                self._insert_solution_ruptures(sol)
            if include_mfds:
                self._insert_solution_mfds(sol)
            return
        self.insert_parent_faults(faults.select("name"))
        parent_map = F.broadcast(self.table("parent_fault"))

        offset = int(
            self.table("fault")
            .agg(F.coalesce(F.max("fault_id"), F.lit(0)))
            .collect()[0][0]
        )
        keyed = dense_surrogate_keys(
            faults, ["fault_system", "fault_nshm_id"], "fault_id", offset=offset
        ).localCheckpoint(eager=True)  # keys must not be recomputed per branch below
        self._append(
            "fault",
            keyed.join(parent_map, "name").select(
                "fault_id",
                F.col("fault_nshm_id").alias("nshm_id"),
                "fault_system",
                "rake",
                F.lit(None).cast("int").alias("tect_type"),  # api.py:285
                "parent_id",
            ),
        )

        planes = traces_to_planes(keyed, id_cols=["fault_id"])
        p_offset = int(
            self.table("fault_plane")
            .agg(F.coalesce(F.max("plane_id"), F.lit(0)))
            .collect()[0][0]
        )
        self._append(
            "fault_plane",
            dense_surrogate_keys(
                planes, ["fault_id", "segment_idx"], "plane_id", offset=p_offset
            ),
        )

        if include_ruptures:
            self._insert_solution_ruptures(sol)
        if include_mfds:
            self._insert_solution_mfds(sol)

    def _insert_solution_ruptures(self, sol: dict) -> None:
        self.insert_many_ruptures(
            sol["rupture_properties"].select(
                "nshm_id", "fault_system", "magnitude", "area", "len", "rate"
            ),
            sol["rupture_join_table"].select(
                F.col("rupture_id").alias("rupture_nshm_id"),
                F.col("fault_id").alias("fault_nshm_id"),
                "fault_system",
            ),
        )

    def _insert_solution_mfds(self, sol: dict) -> None:
        mfds = sol.get("magnitude_frequency_distribution")
        if mfds is not None:
            self.insert_magnitude_frequency_distribution(
                mfds.select("nshm_id", "fault_system", "magnitude", "rate")
            )

    def insert_magnitude_frequency_distribution(self, mfds: DataFrame) -> None:
        """Bulk MFD insert (reference nshmdb.py:452-468): resolve
        (fault_system, nshm_id) → fault_id, append (fault_id, magnitude,
        rate) with dense entry ids."""
        resolved = self._assert_resolved(
            self._resolve_fault_ids(
                mfds.withColumnRenamed("nshm_id", "fault_nshm_id")
            ),
            ["fault_id"],
            "insert_magnitude_frequency_distribution",
        )
        offset = int(
            self.table("magnitude_frequency_distribution")
            .agg(F.coalesce(F.max("entry_id"), F.lit(0)))
            .collect()[0][0]
        )
        self._append(
            "magnitude_frequency_distribution",
            dense_surrogate_keys(
                resolved.select("fault_id", "magnitude", "rate"),
                ["fault_id", "magnitude"],
                "entry_id",
                offset=offset,
            ),
        )

    # -- point lookups (reference: nshmdb.py:368-527) ------------------------

    def _fault_rows(self, fault_system: int, fault_nshm_id: int):
        fp = self.table("fault_plane").alias("fp")
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")
        return (
            fp.join(F.broadcast(f), F.col("fp.fault_id") == F.col("f.fault_id"))
            .join(F.broadcast(pf), F.col("f.parent_id") == F.col("pf.parent_id"))
            .filter(
                (F.col("f.nshm_id") == fault_nshm_id)
                & (F.col("f.fault_system") == fault_system)
            )
            .orderBy("fp.plane_id")
        )

    def get_fault(self, fault_system: int, fault_nshm_id: int) -> Fault:
        """reference: nshmdb.py:368-415 (J1)"""
        rows = [r.asDict() for r in self._fault_rows(fault_system, fault_nshm_id).collect()]
        planes = [p for _, p in _planes_from_rows(rows)]
        if self.projection:
            planes = [Plane(self.projection(p.corners)) for p in planes]
        return Fault(planes)

    def get_fault_info(self, fault_system: int, fault_nshm_id: int) -> FaultInfo:
        """reference: nshmdb.py:417-450 (J2)"""
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")
        row = (
            f.join(F.broadcast(pf), F.col("f.parent_id") == F.col("pf.parent_id"))
            .filter(
                (F.col("f.nshm_id") == fault_nshm_id)
                & (F.col("f.fault_system") == fault_system)
            )
            .select("f.fault_system", "f.nshm_id", "pf.name", "f.rake", "f.tect_type")
            .collect()
        )
        if not row:
            raise KeyError(f"no fault ({fault_system}, {fault_nshm_id})")
        r = row[0]
        return FaultInfo(r.fault_system, r.nshm_id, r.name, r.rake, r.tect_type)

    def _rupture_faults_bulk(self, rupture_ids: list[int]) -> dict[int, dict[str, Fault]]:
        """Geometry for MANY ruptures in one job (replaces the reference's
        per-rupture query loop, nshmdb.py:663-683). One join pipeline, one
        collect; rows regrouped driver-side by (rupture, section label)."""
        if not rupture_ids:
            return {}
        fp = self.table("fault_plane").alias("fp")
        rf = self.table("rupture_faults").alias("rf")
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")
        rows = (
            rf.filter(F.col("rf.rupture_id").isin(rupture_ids))
            .join(fp, F.col("fp.fault_id") == F.col("rf.fault_id"))
            .join(F.broadcast(f), F.col("f.fault_id") == F.col("rf.fault_id"))
            .join(F.broadcast(pf), F.col("pf.parent_id") == F.col("f.parent_id"))
            .orderBy("rf.rupture_id", "pf.parent_id", "fp.plane_id")
            .select(
                F.col("rf.rupture_id").alias("rid"),
                # reference labeling (nshmdb.py:559-563): CRUSTAL
                # ruptures merge every section of a parent into ONE
                # fault keyed by the bare parent name (geometries are
                # only connected in the crustal setting); other systems
                # keep per-section labels, and the numeric part is the
                # SURROGATE fault_id, exactly as the reference formats
                F.when(
                    F.col("f.fault_system") == 3,  # FaultSystem.Crustal
                    F.col("pf.name"),
                )
                .otherwise(
                    F.concat(
                        F.col("pf.name"), F.lit(": Section "), F.col("f.fault_id")
                    )
                )
                .alias("name"),
                *[F.col(f"fp.{c}_{ax}") for c in _CORNERS for ax in ("lat", "lon")],
                "fp.top_depth",
                "fp.bottom_depth",
            )
            .collect()
        )
        out: dict[int, dict[str, Fault]] = {rid: {} for rid in rupture_ids}
        for row in rows:
            d = row.asDict()
            (name, plane), = _planes_from_rows([d])
            if self.projection:
                plane = Plane(self.projection(plane.corners))
            out[d["rid"]].setdefault(name, Fault([])).planes.append(plane)
        return out

    def get_rupture_faults(self, rupture_id: int) -> dict[str, Fault]:
        """All fault geometry of one rupture, grouped by section label
        (reference: nshmdb.py:502-565, J3 + driver-side regrouping). The
        parameter is the INTERNAL rupture_id — the reference's docstring
        says nshm id but it is always called with internal ids
        (nshmdb.py:499,672); here the name tells the truth."""
        return self._rupture_faults_bulk([rupture_id]).get(rupture_id, {})

    def get_rupture(self, fault_system: int, rupture_nshm_id: int) -> Rupture:
        """reference: nshmdb.py:470-500 (P2 + chained geometry fetch)"""
        rows = (
            self.table("rupture")
            .filter(
                (F.col("nshm_id") == rupture_nshm_id)
                & (F.col("fault_system") == fault_system)
            )
            .collect()
        )
        if not rows:
            raise KeyError(f"no rupture ({fault_system}, {rupture_nshm_id})")
        r = rows[0]
        return Rupture(
            fault_system=r.fault_system,
            rupture_nshm_id=r.nshm_id,
            magnitude=r.magnitude,
            area=r.area,
            length=r.len,
            rate=r.rate,
            faults=self.get_rupture_faults(r.rupture_id),
        )

    def get_rupture_fault_info(
        self, fault_system: int, rupture_nshm_id: int
    ) -> list[FaultInfo]:
        """Fault info for every section of a rupture (reference:
        nshmdb.py:567-621, J4). Fixed: filters on fault_system too."""
        r = self.table("rupture").alias("r")
        rf = self.table("rupture_faults").alias("rf")
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")
        rows = (
            r.filter(
                (F.col("r.nshm_id") == rupture_nshm_id)
                & (F.col("r.fault_system") == fault_system)
            )
            .join(rf, F.col("rf.rupture_id") == F.col("r.rupture_id"))
            .join(F.broadcast(f), F.col("f.fault_id") == F.col("rf.fault_id"))
            .join(F.broadcast(pf), F.col("pf.parent_id") == F.col("f.parent_id"))
            .select("f.fault_system", "f.nshm_id", "pf.name", "f.rake", "f.tect_type")
            .collect()
        )
        return [
            FaultInfo(x.fault_system, x.nshm_id, x.name, x.rake, x.tect_type)
            for x in rows
        ]

    def get_fault_names(self) -> set[str]:
        """reference: nshmdb.py:596-607 (A9)"""
        return {r.name for r in self.table("parent_fault").select("name").distinct().collect()}

    def get_fault_ids(self) -> set[int]:
        """reference: nshmdb.py:609-621"""
        return {r.nshm_id for r in self.table("fault").select("nshm_id").distinct().collect()}

    # -- rates (reference: most_likely_fault, nshmdb.py:165-248) -------------

    def most_likely_fault(
        self, fault_system: int, rupture_nshm_id: int, magnitudes: dict[str, float]
    ) -> dict[str, float]:
        """Σ MFD rate per parent fault at the nearest-≥ magnitude
        (J11 + A1, nshmdb.py:204-234): round each requested magnitude up
        to the smallest distinct MFD magnitude ≥ it (clamped to max)
        over the rupture's GLOBAL magnitude set — all its faults, the
        reference's single searchsorted array — then sum rates per
        parent-fault name. A parent with no MFD row at its rounded
        magnitude is OMITTED from the result, exactly as the
        reference's equality join drops it (rounding within each
        parent's own set would fabricate an answer instead)."""
        r = self.table("rupture").alias("r")
        rf = self.table("rupture_faults").alias("rf")
        mfd = self.table("magnitude_frequency_distribution").alias("mfd")
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")

        rupture_mfd = (
            r.filter(
                (F.col("r.nshm_id") == rupture_nshm_id)
                & (F.col("r.fault_system") == fault_system)
            )
            .join(rf, F.col("rf.rupture_id") == F.col("r.rupture_id"))
            .join(mfd, F.col("mfd.fault_id") == F.col("rf.fault_id"))
            .join(F.broadcast(f), F.col("f.fault_id") == F.col("rf.fault_id"))
            .join(F.broadcast(pf), F.col("pf.parent_id") == F.col("f.parent_id"))
            .select("pf.name", "mfd.magnitude", "mfd.rate")
        )

        targets = self.spark.createDataFrame(
            list(magnitudes.items()), "name string, target double"
        )
        from nshm2022db_spark.operators import nearest_ge_lookup

        # GLOBAL domain: one distinct-magnitude set across the whole
        # rupture (the reference's single searchsorted array), shared by
        # every requested parent
        rounded = nearest_ge_lookup(
            rupture_mfd.select("magnitude"), "magnitude", targets, "target"
        )
        named = targets.join(rounded, "target").select("name", "rounded")
        rates = (
            named.alias("t")
            .join(
                rupture_mfd.alias("m"),
                (F.col("m.name") == F.col("t.name"))
                & (F.col("m.magnitude") == F.col("t.rounded")),
            )
            .groupBy("t.name")
            .agg(F.sum("m.rate").alias("rate"))
            .collect()
        )
        return {x.name: x.rate for x in rates}

    # -- the advanced query (reference: nshmdb.py:623-683) -------------------

    def query(
        self,
        query_str: str,
        rate_bounds: tuple[float | None, float | None] | None = None,
        magnitude_bounds: tuple[float | None, float | None] | None = None,
        limit: int = 100,
        fault_count_limit: int | None = None,
    ) -> list[Rupture]:
        """Membership-DSL query → hydrated Ruptures WITH geometry, one
        Spark job + one geometry join — no per-row round trips (§3.1)."""
        f = self.table("fault").alias("f")
        pf = self.table("parent_fault").alias("pf")
        dim = f.join(F.broadcast(pf), F.col("f.parent_id") == F.col("pf.parent_id")).select(
            F.col("f.fault_id").alias("fault_id"), F.col("pf.name").alias("name")
        )
        t = AdvancedQueryTables(
            fact=self.table("rupture"),
            bridge=self.table("rupture_faults"),
            dim=dim,
            fact_key="rupture_id",
            bridge_fact_key="rupture_id",
            bridge_dim_key="fault_id",
            dim_key="fault_id",
            name_col="name",
            rate_col="rate",
            magnitude_col="magnitude",
        )
        hits = advanced_query(
            t,
            query_str,
            rate_bounds=rate_bounds,
            magnitude_bounds=magnitude_bounds,
            limit=limit,
            fault_count_limit=fault_count_limit,
        )

        # single geometry join for ALL hit ruptures (replaces N+1)
        rows = hits.collect()
        geometry = self._rupture_faults_bulk([r.rupture_id for r in rows])
        return [
            Rupture(
                r.fault_system,
                r.nshm_id,
                r.magnitude,
                r.area,
                r.len,
                r.rate,
                faults=geometry.get(r.rupture_id, {}),
            )
            for r in rows
        ]
