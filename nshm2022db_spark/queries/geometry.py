"""Geometry queries: GeoJSON scan (S8) + plane construction (F1-F4).

Oracle pattern mirrors ragged_csv_roundtrip: a GeoJSON FeatureCollection is
synthesized DETERMINISTICALLY from the ``nation`` parquet (one fault per
nation, trace/property values pure formulas of n_nationkey), written to a
scratch file, and scanned back with the real GeoJSON source. The DuckDB
oracle recomputes the same formulas straight from ``nation`` — so what the
compare actually verifies is the file-format round trip and the
explode/extract pipeline.

``geometry_planes`` (plane corners, NZTM transverse-Mercator math) has no
SQL-expressible oracle — the projection series is not DuckDB SQL — so it
registers rows-only; tests/test_geo.py pins the math with golden invariants
instead (round-trip < 1e-9°, central-meridian easting exact, down-dip
offset length recovered to < 1 mm).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.functions.geo import traces_to_planes
from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table
from nshm2022db_spark.sources.geojson import read_fault_geojson

_N_TRACE_POINTS = 4


def _synth_geojson(spark: SparkSession, sf: str) -> str:
    """Deterministic FeatureCollection derived from nation (25 rows at any
    sf). Formulas must match the SQL in the geojson_scan oracle. The
    write itself is atomic (tmp + os.replace), so no landing marker is
    needed — just a process-stable path key."""
    from nshm2022db_spark.sources.scratch import scratch_path

    out_dir = scratch_path("fault_geojson", sf)
    path = os.path.join(out_dir, "faults.json")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)

    rows = (
        read_table(spark, sf, "nation")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .collect()
    )
    features = []
    for r in rows:
        k = r.n_nationkey
        coords = [
            [166.0 + k * 0.2 + i * 0.05, -47.0 + k * 0.1 + i * 0.03]
            for i in range(_N_TRACE_POINTS)
        ]
        props = {
            "FaultID": k,
            "ParentName": r.n_name,
            "Rake": float((k * 37) % 360 - 180),
            "DipDeg": float(30 + (k % 7) * 10),
            "UpDepth": float(k % 4),
            "LowDepth": float(k % 4 + 10),
        }
        if k % 5 != 0:  # every 5th fault exercises dip-dir inference (F2)
            props["DipDir"] = float((k * 53) % 360)
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": coords},
                "properties": props,
            }
        )
    # unique tmp per writer: a SHARED tmp name lets two concurrent
    # processes interleave writes and publish corrupt JSON — atomicity
    # of os.replace only covers a single writer's file
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)
    os.replace(tmp, path)
    return path


@register(
    "geojson_scan",
    f"""SELECT n_nationkey AS fault_nshm_id,
              n_name AS name,
              CAST((n_nationkey * 37) % 360 - 180 AS DOUBLE) AS rake,
              CAST(30 + (n_nationkey % 7) * 10 AS DOUBLE) AS dip,
              CASE WHEN n_nationkey % 5 = 0 THEN NULL
                   ELSE CAST((n_nationkey * 53) % 360 AS DOUBLE) END AS dip_dir,
              CAST(n_nationkey % 4 AS DOUBLE) AS top_depth,
              CAST(n_nationkey % 4 + 10 AS DOUBLE) AS bottom_depth,
              {_N_TRACE_POINTS} AS n_points,
              ROUND(CAST(166.0 + n_nationkey * 0.2 AS DOUBLE), 4) AS first_lon,
              ROUND(CAST(-47.0 + n_nationkey * 0.1
                    + {_N_TRACE_POINTS - 1} * 0.03 AS DOUBLE), 4) AS last_lat
       FROM nation""",
)
def geojson_scan(spark: SparkSession, sf: str) -> DataFrame:
    """S8 — GeoJSON FeatureCollection scan (reference nshmdb/api.py:475-482):
    multiLine JSON read, feature explode, property + trace extraction, all
    JVM-side Column work."""
    faults = read_fault_geojson(spark, _synth_geojson(spark, sf))
    return faults.select(
        "fault_nshm_id",
        "name",
        "rake",
        "dip",
        "dip_dir",
        "top_depth",
        "bottom_depth",
        F.size("trace").alias("n_points"),
        F.round(F.element_at(F.col("trace"), 1)[0], 4).alias("first_lon"),
        F.round(F.element_at(F.col("trace"), -1)[1], 4).alias("last_lat"),
    )


@register("geometry_planes")  # rows-only: TM projection is not DuckDB SQL
def geometry_planes(spark: SparkSession, sf: str) -> DataFrame:
    """F1-F4 — full ingest geometry pipeline (reference nshmdb/api.py:
    244-289): GeoJSON traces → consecutive-duplicate cleanup → dip-dir
    inference where absent → per-segment quadrilateral corners with the
    down-dip edge displaced via NZTM, flattened to the fault_plane layout
    (schema.sql:20-34). mapInPandas, shuffle-free."""
    faults = read_fault_geojson(spark, _synth_geojson(spark, sf))
    planes = traces_to_planes(faults)
    rounded = [
        F.round(c, 6).alias(c)
        for c in planes.columns
        if c not in ("fault_nshm_id", "segment_idx")
    ]
    return planes.select("fault_nshm_id", "segment_idx", *rounded).orderBy(
        "fault_nshm_id", "segment_idx"
    )


def _pt_lon(i: int) -> str:
    return f"CAST(166.0 + n_nationkey * 0.2 + {i} * 0.05 AS DOUBLE)"


def _pt_lat(i: int) -> str:
    return f"CAST(-47.0 + n_nationkey * 0.1 + {i} * 0.03 AS DOUBLE)"


def _trace_sum(pt) -> str:
    """Top-corner checksum as a function of the trace length: each
    interior trace point is a corner of TWO planes (end of one, start
    of the next), endpoints of one — generated from _N_TRACE_POINTS so
    the oracle stays correct if the synthesis geometry ever changes
    (hardcoded 1,2,2,1 weights would silently diverge)."""
    terms = " + ".join(
        ("" if i in (0, _N_TRACE_POINTS - 1) else "2 * ") + pt(i)
        for i in range(_N_TRACE_POINTS)
    )
    return f"({terms})"


@register(
    "geometry_planes_checksum",
    f"""SELECT n_nationkey AS fault_nshm_id,
              CAST({_N_TRACE_POINTS - 1} AS BIGINT) AS n_planes,
              ROUND({_pt_lon(0)}, 4) AS min_top_lon,
              ROUND({_pt_lon(_N_TRACE_POINTS - 1)}, 4) AS max_top_lon,
              ROUND({_pt_lat(0)}, 4) AS min_top_lat,
              ROUND({_pt_lat(_N_TRACE_POINTS - 1)}, 4) AS max_top_lat,
              ROUND({_trace_sum(_pt_lon)}, 4) AS top_lon_sum,
              ROUND({_trace_sum(_pt_lat)}, 4) AS top_lat_sum,
              CAST(n_nationkey % 4 AS DOUBLE) AS top_depth,
              CAST(n_nationkey % 4 + 10 AS DOUBLE) AS bottom_depth,
              CASE WHEN n_nationkey % 7 = 6
                   THEN ROUND({_trace_sum(_pt_lon)}, 4)
                   ELSE NULL END AS vert_bot_lon_sum,
              CASE WHEN n_nationkey % 7 = 6
                   THEN ROUND({_trace_sum(_pt_lat)}, 4)
                   ELSE NULL END AS vert_bot_lat_sum
       FROM nation""",
)
def geometry_planes_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL-checkable PROJECTION of `geometry_planes` — a partial hash
    oracle for the one rows-only query. The NZTM series itself is not
    DuckDB SQL, but the construction (reference nshmdb/api.py:268-277)
    leaves two surfaces the oracle CAN pin exactly:

    * top-edge corners are the raw WGS84 trace points (planes_from_trace
      puts the trace at top depth un-projected), so per-fault plane
      counts, top-corner bounding boxes, and top-corner checksums are
      closed-form in the synthesis formulas;
    * vertical faults (dip 90°) get zero down-dip offset, so their
      BOTTOM corners must equal the top corners — projected through the
      full NZTM forward+inverse round trip in Spark, closed-form in SQL.

    Only the non-vertical bottom-corner displacement stays SQL-invisible
    (golden-tested in tests/test_geo.py). Same mapInPandas plan as
    geometry_planes plus ONE partial-agg exchange on fault_nshm_id."""
    faults = read_fault_geojson(spark, _synth_geojson(spark, sf)).withColumn(
        "dip_deg", F.col("dip")
    )
    planes = traces_to_planes(faults, id_cols=["fault_nshm_id", "dip_deg"])
    vert = F.col("dip_deg") == 90.0
    return (
        planes.groupBy("fault_nshm_id")
        .agg(
            F.count("*").alias("n_planes"),
            F.round(F.min("top_left_lon"), 4).alias("min_top_lon"),
            F.round(F.max("top_right_lon"), 4).alias("max_top_lon"),
            F.round(F.min("top_left_lat"), 4).alias("min_top_lat"),
            F.round(F.max("top_right_lat"), 4).alias("max_top_lat"),
            F.round(
                F.sum(F.col("top_left_lon") + F.col("top_right_lon")), 4
            ).alias("top_lon_sum"),
            F.round(
                F.sum(F.col("top_left_lat") + F.col("top_right_lat")), 4
            ).alias("top_lat_sum"),
            F.max("top_depth").alias("top_depth"),
            F.max("bottom_depth").alias("bottom_depth"),
            F.round(
                F.sum(
                    F.when(
                        vert,
                        F.col("bottom_left_lon") + F.col("bottom_right_lon"),
                    )
                ),
                4,
            ).alias("vert_bot_lon_sum"),
            F.round(
                F.sum(
                    F.when(
                        vert,
                        F.col("bottom_left_lat") + F.col("bottom_right_lat"),
                    )
                ),
                4,
            ).alias("vert_bot_lat_sum"),
        )
        .orderBy("fault_nshm_id")
    )
