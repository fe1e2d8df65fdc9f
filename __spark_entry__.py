"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2 inventory) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` holds the DuckDB twin for
each. Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nshm2022db_spark.registry import ORACLES, QUERIES, ensure_driver_order, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship advanced (membership-DSL) query on /root/testdata/sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver
    order (the gate verifies a fixed-size prefix — see registry.py)."""
    ensure_driver_order()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted ⇒ rows-only)."""
    ensure_driver_order()
    return dict(ORACLES)
