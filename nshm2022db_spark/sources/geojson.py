"""GeoJSON fault-trace source (reference: S8, nshmdb/api.py:475-482,244-289).

The reference parses a FeatureCollection driver-side with the ``geojson``
package, one feature at a time. Spark-first: ``spark.read.json(multiLine)``
parses the whole collection inside the JVM, ``explode`` fans the features
out across partitions, and property/coordinate extraction is pure Column
work — no Python in the loop until plane construction (functions/geo.py).

NSHM traces are LineStrings: coordinates land as array<array<double>> of
[lon, lat]. Properties follow the NSHM attribute names (FaultID,
ParentName, UpDepth, LowDepth, DipDeg, DipDir, Rake —
nshmdb/api.py:253-261).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit feature schema: skips the inference pass (which re-reads the
# file) and pins property types regardless of which features carry DipDir.
FEATURE_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField(
                            "geometry",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField(
                                        "coordinates",
                                        T.ArrayType(T.ArrayType(T.DoubleType())),
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "properties",
                            T.StructType(
                                [
                                    T.StructField("FaultID", T.LongType()),
                                    T.StructField("ParentName", T.StringType()),
                                    T.StructField("Rake", T.DoubleType()),
                                    T.StructField("DipDeg", T.DoubleType()),
                                    T.StructField("DipDir", T.DoubleType()),
                                    T.StructField("UpDepth", T.DoubleType()),
                                    T.StructField("LowDepth", T.DoubleType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_fault_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Scan a GeoJSON FeatureCollection of fault traces → one row per fault
    with columns (fault_nshm_id, name, rake, dip, dip_dir, top_depth,
    bottom_depth, trace)."""
    raw = (
        spark.read.option("multiLine", "true")
        .schema(FEATURE_COLLECTION_SCHEMA)
        .json(path)
    )
    feats = raw.select(F.explode("features").alias("f"))
    return feats.select(
        F.col("f.properties.FaultID").cast("long").alias("fault_nshm_id"),
        F.col("f.properties.ParentName").alias("name"),
        F.col("f.properties.Rake").cast("double").alias("rake"),
        F.col("f.properties.DipDeg").cast("double").alias("dip"),
        F.col("f.properties.DipDir").cast("double").alias("dip_dir"),
        F.col("f.properties.UpDepth").cast("double").alias("top_depth"),
        F.col("f.properties.LowDepth").cast("double").alias("bottom_depth"),
        F.col("f.geometry.coordinates").alias("trace"),
    )
