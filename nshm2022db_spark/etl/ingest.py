"""Composite-solution ETL, Spark-first (reference: nshmdb/api.py:292-562).

The reference streams one logic-tree-branch zip at a time and accumulates
``rate += weight·rate`` in pandas to bound single-node memory
(api.py:494-515). Distributed, the same computation is: land every branch
file, read them all in one DataFrame with a `weight` column, and let one
hash aggregate do the weighted merge — partial aggregation IS the
reference's accumulator, parallel over branches and keys (SURVEY A7/§3.3).

Network fetch (GraphQL logic-tree enumeration + zip downloads,
api.py:41-176) is driver-side by nature and out of the data plane: land
files to storage, then everything below is DataFrames.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nshm2022db_spark.operators import weighted_branch_merge
from nshm2022db_spark.operators.reshape import parse_ragged_indices, unpivot_wide


def parse_mfd_wide(mfd_wide: DataFrame, id_col: str = "nshm_id") -> DataFrame:
    """Wide MFD (one column per magnitude bin, reference api.py:316-319) →
    long (nshm_id, magnitude, rate), zero-rate rows dropped (P5,
    api.py:318). Magnitude bin = the column name, parsed to double."""
    value_cols = [c for c in mfd_wide.columns if c != id_col]
    long = unpivot_wide(mfd_wide, [id_col], value_cols, "magnitude", "rate")
    return long.withColumn("magnitude", F.col("magnitude").cast("double")).filter(
        F.col("rate") > 0
    )


def parse_rupture_indices(lines: DataFrame) -> DataFrame:
    """Ragged `rupture, n, fault_1..fault_n` text lines → (rupture_id,
    fault_id) bridge rows (S7/U3, reference api.py:362-398)."""
    return parse_ragged_indices(lines)


def merge_branches(
    branches: list[tuple[float, DataFrame]], key_cols: list[str], rate_col: str = "rate"
) -> DataFrame:
    """Weighted logic-tree composite: Σ weightᵢ·rateᵢ per key
    (A7/J10, reference api.py:494-515) as union + one hash aggregate."""
    return weighted_branch_merge(branches, key_cols, rate_col)


def stack_fault_systems(solutions: list[DataFrame]) -> DataFrame:
    """Concatenate per-fault-system solution frames (U1, reference
    api.py:525-562). unionByName so column order never matters."""
    return reduce(lambda a, b: a.unionByName(b), solutions)


# -- S6: CSV scans with the reference's column contracts ---------------------
# Explicit schemas, never inference — headers carry spaces/units exactly as
# the solution zips ship them (reference api.py:340-356).

RUPTURE_RATES_SCHEMA = "`Rupture Index` long, `Annual Rate` double"
RUPTURE_PROPERTIES_SCHEMA = (
    "`Rupture Index` long, Magnitude double, `Area (m^2)` double, `Length (m)` double"
)


def read_rupture_csvs(spark, rates_path: str, properties_path: str, fault_system: int) -> DataFrame:
    """Rupture properties ⋈ rates on `Rupture Index` (S6+J9+U4, reference
    api.py:323-356): two header CSV scans with explicit schemas, an
    equi-join on the index, and the rename to engine column names."""
    rates = spark.read.csv(rates_path, header=True, schema=RUPTURE_RATES_SCHEMA)
    props = spark.read.csv(
        properties_path, header=True, schema=RUPTURE_PROPERTIES_SCHEMA
    )
    return (
        props.join(rates, "Rupture Index")
        .select(
            F.col("Rupture Index").alias("nshm_id"),
            F.col("Magnitude").alias("magnitude"),
            F.col("Area (m^2)").alias("area"),
            F.col("Length (m)").alias("len"),
            F.col("Annual Rate").alias("rate"),
        )
        .withColumn("fault_system", F.lit(fault_system))
    )


def read_mfd_csv(spark, path: str, fault_system: int) -> DataFrame:
    """Wide MFD CSV (`Section Index` + one column per magnitude bin) → long
    (nshm_id, magnitude, rate, fault_system) with zero rates dropped
    (S6+U2+P5, reference api.py:292-320). Bin headers are data, so the
    header row names the columns and every bin is cast to double before
    the unpivot."""
    raw = spark.read.csv(path, header=True)
    value_cols = [c for c in raw.columns if c != "Section Index"]
    # bin headers are literal floats ("6.5") — backticked expr, F.col would
    # read the dot as a struct accessor
    typed = raw.select(
        F.col("Section Index").cast("long").alias("nshm_id"),
        *[
            F.expr(f"`{c.replace('`', '``')}`").cast("double").alias(c)
            for c in value_cols
        ],
    )
    return parse_mfd_wide(typed).withColumn("fault_system", F.lit(fault_system))
