"""Weighted branch merge — A7/J10 in SURVEY §2.4.

The reference composites logic-tree branches one at a time,
``rate += weight * rate_branch`` index-aligned in pandas (api.py:494-515),
to bound single-node memory. Distributed, the principled form is
union-all + groupBy-sum: Spark's partial (map-side) aggregation IS the
incremental accumulator, parallel over branches and keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_branch_merge(
    branches: list[tuple[float, DataFrame]],
    key_cols: list[str],
    rate_col: str = "rate",
) -> DataFrame:
    """Σᵢ weightᵢ·rateᵢ per key across branches.

    Each branch frame gets its weight as a literal column; union-by-name
    then one hash aggregate. No branch ordering, no driver-side state —
    wall-clock scales with max(branch size)/cluster, not Σ.
    """
    weighted = [
        df.select(*key_cols, (F.lit(w) * F.col(rate_col)).alias("__wr"))
        for w, df in branches
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), weighted)
    return unioned.groupBy(*key_cols).agg(F.sum("__wr").alias(rate_col))
