"""Top-k operators — O3 in SURVEY §2.6.

Reference: ORDER BY rate DESC NULLS LAST + LIMIT (query.py:330-332).
Spark plans ``orderBy().limit(k)`` as TakeOrderedAndProject: each partition
keeps its local top-k, the driver merges — no global sort, no full shuffle.
Always tie-break on a unique key so the k-th row is deterministic across
engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, group_cols: list[str], order: list[Column], k: int) -> DataFrame:
    """row_number ≤ k per group. One shuffle on the group key; the window
    sort is per-partition. (The reference has no per-group top-k; this is
    the idiomatic scale-out generalization.)"""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
