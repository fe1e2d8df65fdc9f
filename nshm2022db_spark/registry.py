"""Query registry: every implemented operator as a (Spark callable, DuckDB
oracle SQL) pair, keyed by a stable name.

This is the single source __spark_entry__.py exposes to the driver, and the
local harness (tools/verify_local.py) runs the same pairs. Numbers track
SURVEY.md §2 operator ids in the docstrings.

Float discipline: every aggregate that sums doubles is rounded (ROUND(x, 4))
on BOTH sides — partial-aggregation order differs between engines, and the
driver hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.plans.advanced_query import (
    AdvancedQueryTables,
    OracleNames,
    advanced_query,
    advanced_query_oracle_sql,
)
from nshm2022db_spark.sources import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable, optionally
    with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: the membership-DSL advanced query (SURVEY §3.1; J7+A2+A3+A5+O3)
# ---------------------------------------------------------------------------

FLAGSHIP_DSL = "Brand#1 & !(Brand#2 | Brand#3)"
_FLAGSHIP_KW = dict(rate_bounds=(1000.0, None), limit=100, fault_count_limit=4)


def _star_tables(spark: SparkSession, sf_dir: str) -> AdvancedQueryTables:
    """orders ← lineitem → part plays rupture ← rupture_faults → fault
    (FIXTURES.md §B role mapping)."""
    return AdvancedQueryTables(
        fact=read_table(spark, sf_dir, "orders"),
        bridge=read_table(spark, sf_dir, "lineitem"),
        dim=read_table(spark, sf_dir, "part"),
        fact_key="o_orderkey",
        bridge_fact_key="l_orderkey",
        bridge_dim_key="l_partkey",
        dim_key="p_partkey",
        name_col="p_brand",
        rate_col="o_totalprice",
    )


_FLAGSHIP_ORACLE_NAMES = OracleNames(
    fact="orders",
    bridge="lineitem",
    dim="part",
    fact_key="o_orderkey",
    bridge_fact_key="l_orderkey",
    bridge_dim_key="l_partkey",
    dim_key="p_partkey",
    name_col="p_brand",
    rate_col="o_totalprice",
    fact_cols=(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
)


@register(
    "advanced_query_dsl",
    advanced_query_oracle_sql(_FLAGSHIP_ORACLE_NAMES, FLAGSHIP_DSL, **_FLAGSHIP_KW),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL `Brand#1 & !(Brand#2 | Brand#3)`: orders whose lineitems include
    Brand#1 parts but no Brand#2/#3, ≤4 distinct brands, totalprice ≥ 1000,
    top-100 by totalprice (reference semantics: query.py:318-333)."""
    return advanced_query(_star_tables(spark, sf_dir), FLAGSHIP_DSL, **_FLAGSHIP_KW)


# Populate the registry: importing each family module runs its @register
# decorators. Bottom import is deliberate (modules import `register` back
# from here).
from nshm2022db_spark.queries import geometry, relational  # noqa: E402,F401
from nshm2022db_spark.extensions import dedup, multimodal, similarity, text  # noqa: E402,F401
from nshm2022db_spark.streaming import events, joins, stateful  # noqa: E402,F401
