"""NSHMDB-parity public API over Parquet tables (reference: nshmdb/nshmdb.py)."""

from nshm2022db_spark.api.database import NSHMDB, Fault, FaultInfo, Plane, Rupture

__all__ = ["NSHMDB", "Fault", "FaultInfo", "Plane", "Rupture"]
