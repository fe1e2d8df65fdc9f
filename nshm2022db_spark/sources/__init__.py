"""Sources and sinks (SURVEY §2.1)."""

from nshm2022db_spark.sources.parquet import load_star, read_table, spread, write_table

__all__ = ["load_star", "read_table", "spread", "write_table"]
