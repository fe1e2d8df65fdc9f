"""Explicit StructType schemas — no inference anywhere.

NSHM domain tables mirror the reference DDL
(/root/reference/nshmdb/schema/schema.sql:1-71); the testdata star schema
mirrors /root/testdata (TESTDATA.md / FIXTURES.md §B). Nullability follows
the reference: rupture measures and fault.tect_type are nullable, keys are
not. Spark has no UNIQUE/FK constraints — natural-key uniqueness
(fault_system, nshm_id) is enforced at write time (see etl.keys) and FKs
are join contracts pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# NSHM domain schema (reference: schema.sql:1-71)
# ---------------------------------------------------------------------------

PARENT_FAULT = T.StructType(
    [
        T.StructField("parent_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

# schema.sql:1-13 — tect_type nullable; natural key (fault_system, nshm_id)
FAULT = T.StructType(
    [
        T.StructField("fault_id", T.LongType(), False),
        T.StructField("nshm_id", T.LongType(), False),
        T.StructField("fault_system", T.IntegerType(), False),
        T.StructField("rake", T.DoubleType(), False),
        T.StructField("tect_type", T.IntegerType(), True),
        T.StructField("parent_id", T.LongType(), False),
    ]
)

# schema.sql:20-34 — geometry flattened to 8 corner REALs + 2 depths, kept
# flat on purpose: join-friendly, pure-column math, no nested types at rest.
FAULT_PLANE = T.StructType(
    [T.StructField("plane_id", T.LongType(), False)]
    + [
        T.StructField(f"{corner}_{axis}", T.DoubleType(), False)
        for corner in ("top_left", "top_right", "bottom_right", "bottom_left")
        for axis in ("lat", "lon")
    ]
    + [
        T.StructField("top_depth", T.DoubleType(), False),
        T.StructField("bottom_depth", T.DoubleType(), False),
        T.StructField("fault_id", T.LongType(), False),
    ]
)

# schema.sql:36-48 — all measures nullable
RUPTURE = T.StructType(
    [
        T.StructField("rupture_id", T.LongType(), False),
        T.StructField("fault_system", T.IntegerType(), False),
        T.StructField("nshm_id", T.LongType(), False),
        T.StructField("area", T.DoubleType(), True),
        T.StructField("magnitude", T.DoubleType(), True),
        T.StructField("len", T.DoubleType(), True),
        T.StructField("rate", T.DoubleType(), True),
    ]
)

# schema.sql:50-57 — many-to-many bridge, UNIQUE(rupture_id, fault_id)
RUPTURE_FAULTS = T.StructType(
    [
        T.StructField("rupture_fault_id", T.LongType(), False),
        T.StructField("rupture_id", T.LongType(), False),
        T.StructField("fault_id", T.LongType(), False),
    ]
)

# schema.sql:59-66 — UNIQUE(fault_id, magnitude)
MFD = T.StructType(
    [
        T.StructField("entry_id", T.LongType(), False),
        T.StructField("fault_id", T.LongType(), False),
        T.StructField("magnitude", T.DoubleType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ]
)

NSHM_TABLES: dict[str, T.StructType] = {
    "parent_fault": PARENT_FAULT,
    "fault": FAULT,
    "fault_plane": FAULT_PLANE,
    "rupture": RUPTURE,
    "rupture_faults": RUPTURE_FAULTS,
    "magnitude_frequency_distribution": MFD,
}

# Closed fault-system enum (reference: nshmdb/nshmdb.py:32-37)
FAULT_SYSTEMS = {"Hikurangi": 1, "Puysegur": 2, "Crustal": 3}

# ---------------------------------------------------------------------------
# Driver testdata star schema (TESTDATA.md; FIXTURES.md §B)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

STAR_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
