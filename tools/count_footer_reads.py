"""Count driver-side parquet footer reads (`pyarrow.parquet.read_schema`)
and `_footer_schema` invocations while running registered queries
end-to-end (noop sink) — the instrumentation for the manifest-recorded
schema change (r16 #1): a committed-table read should do ZERO footer
reads once the manifest carries `dir_schemas`.

Usage: python tools/count_footer_reads.py <repo_dir> <query> [query ...]
       SPARK_GRAFT_SF_DIR honored as in bench.py.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo = sys.argv[1]
    names = sys.argv[2:]
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nshm2022db_spark.session import get_spark
    from nshm2022db_spark.streaming import sinks

    import pyarrow.parquet as pq

    counts = {"footer_reads": 0, "footer_schema_calls": 0}
    real_read_schema = pq.read_schema

    def counting_read_schema(*a, **kw):
        counts["footer_reads"] += 1
        return real_read_schema(*a, **kw)

    pq.read_schema = counting_read_schema

    real_fs = sinks._footer_schema

    def counting_fs(paths):
        counts["footer_schema_calls"] += 1
        return real_fs(paths)

    sinks._footer_schema = counting_fs

    spark = get_spark("count_footer_reads")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    entry = os.path.join(repo, "__spark_entry__.py")
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_counted", entry)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    for name in names:
        # memoized metadata from a prior query would hide reads; clear
        sinks._FOOTER_SCHEMA_MEMO.clear()
        counts["footer_reads"] = 0
        counts["footer_schema_calls"] = 0
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(
            f"FOOTER {name}: read_schema={counts['footer_reads']} "
            f"footer_schema_calls={counts['footer_schema_calls']}",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
