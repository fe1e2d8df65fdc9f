"""Time selected registered queries bench-style (warm-up + min of N,
noop sink) in ONE session — the same methodology as bench.py, scoped to
a subset so A/B probes do not pay a full 164-query run.

Usage: python tools/time_queries.py [-n RUNS] <query> [query ...]
       SPARK_GRAFT_SF_DIR honored as in bench.py.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nshm2022db_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    import __spark_entry__ as mod

    qs = mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        _run(qs[name](spark, sf_dir))  # warm-up
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _run(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        print(f"TIME {name}={best:.3f}", flush=True)
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
