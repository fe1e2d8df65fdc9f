"""Per-job profile of one or more registered queries (guide §1/§7).

Runs each named query with the Spark UI enabled, then reads the UI REST
API to print every Spark job's wall time, its description, and the gaps
between jobs (driver-side time: planning, commit protocol, py4j).

Usage: python tools/profile_query.py <query> [query ...]
       SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.

The timed run matches bench.py methodology (warm-up + noop sink) so the
breakdown maps 1:1 onto the bench numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def _get_spark_with_ui() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/derby")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _ui_jobs(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded") as r:
        return json.loads(r.read())


def _ms(ts: str) -> float:
    # "2026-08-17T11:22:33.123GMT"
    t = ts.replace("GMT", "+00:00")
    return datetime.fromisoformat(t).replace(tzinfo=timezone.utc).timestamp() * 1000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query ...]")
        raise SystemExit(2)

    spark = _get_spark_with_ui()

    import __spark_entry__ as mod

    qs = mod.queries()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    import gc

    for name in names:
        fn = qs[name]
        # warm-up (codegen, workers, footer caches)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        gc.collect()
        seen = {j["jobId"] for j in _ui_jobs(spark)}
        t_lo = time.time() * 1000
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        t_hi = time.time() * 1000
        spark.catalog.clearCache()
        gc.collect()
        jobs = [
            j
            for j in _ui_jobs(spark)
            if j["jobId"] not in seen and "completionTime" in j
        ]
        jobs.sort(key=lambda j: j["submissionTime"])

        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        prev_end = t_lo
        total_job = 0.0
        total_gap = 0.0
        for j in jobs:
            sub = _ms(j["submissionTime"])
            end = _ms(j["completionTime"])
            dur = (end - sub) / 1000.0
            gap = max(0.0, (sub - prev_end) / 1000.0)
            total_job += dur
            total_gap += gap
            desc = (j.get("description") or j.get("name") or "")[:100]
            print(
                f"  job {j['jobId']:>4}  gap {gap:6.3f}  dur {dur:6.3f}  "
                f"stages {len(j.get('stageIds', [])):>2} "
                f"tasks {j.get('numTasks', 0):>4}  {desc}"
            )
            prev_end = end
        tail = max(0.0, (t_hi - prev_end) / 1000.0)
        print(
            f"  --- jobs {total_job:.3f}s, inter-job gaps {total_gap:.3f}s, "
            f"tail {tail:.3f}s, wall {wall:.3f}s"
        )


if __name__ == "__main__":
    main()
