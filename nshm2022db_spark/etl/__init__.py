"""Ingestion ETL (reference: nshmdb/api.py — the composite-solution build)."""

from nshm2022db_spark.etl.ingest import (
    merge_branches,
    parse_mfd_wide,
    parse_rupture_indices,
    stack_fault_systems,
)

__all__ = [
    "merge_branches",
    "parse_mfd_wide",
    "parse_rupture_indices",
    "stack_fault_systems",
]
