"""Key management — A8, J8, J13 in SURVEY §2.

The reference generates surrogate keys as MAX(id)+1+enumerate
(nshmdb.py:270-272), resolves natural→surrogate via left-merge lookup maps
(nshmdb.py:313-334), and upserts with INSERT OR IGNORE (nshmdb.py:263-266).
Spark equivalents: dense row_number (monotonically_increasing_id leaves
gaps — the reference's keys are dense), broadcast left join, left-anti join
(Delta MERGE once a transactional store is attached).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_surrogate_keys(
    df: DataFrame, order_cols: list[str], key_name: str, offset: int = 0
) -> DataFrame:
    """Assign dense 1-based surrogate keys ordered by the natural key.

    row_number over a global window is a single-partition sort of the
    DISTINCT keys only — at 100 TB you key the (small) dimension after a
    distinct, never the fact table; for facts use
    zipWithIndex-free ``monotonically_increasing_id`` when density is not
    required (SURVEY §1.4)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(key_name, F.row_number().over(w) + F.lit(offset))


def resolve_natural_keys(
    facts: DataFrame, idmap: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Natural→surrogate resolution (J8): broadcast the id map."""
    return facts.join(F.broadcast(idmap), on=on, how=how)


def upsert_missing(new: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """INSERT-OR-IGNORE as a left-anti join (J13): rows of ``new`` whose
    natural key is absent from ``existing``. Caller appends the result."""
    return new.join(existing.select(*on), on=on, how="left_anti")
