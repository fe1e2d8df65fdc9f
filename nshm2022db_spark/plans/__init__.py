"""Composed query pipelines (SURVEY §3)."""

from nshm2022db_spark.plans.advanced_query import (
    AdvancedQueryTables,
    advanced_query,
    advanced_query_oracle_sql,
)

__all__ = ["AdvancedQueryTables", "advanced_query", "advanced_query_oracle_sql"]
