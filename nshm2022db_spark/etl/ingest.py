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
