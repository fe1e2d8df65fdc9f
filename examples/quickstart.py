"""Quickstart — the reference's README workflow on the Spark engine.

A user of `nshmdb` switches like-for-like: the database is a directory of
Parquet tables instead of a SQLite file, and every method keeps its
reference name and result shape (reference README.md + nshmdb.py:84-683).

Run: python examples/quickstart.py  (builds a small synthetic db in /tmp)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from nshm2022db_spark.session import get_spark


def main() -> None:
    spark = get_spark("quickstart", master="local[8]")

    # --- open (or build) a database --------------------------------------
    # reference: db = NSHMDB('nshmdb_v2026.06.1.db')
    # here: a directory of parquet tables; build a synthetic one to demo.
    from gen_nshm_synth import build

    path = tempfile.mkdtemp(prefix="nshmdb_demo_")
    db = build(spark, path, n_parents=10, n_ruptures=500)
    print(f"database at {path}: "
          f"{db.table('rupture').count()} ruptures, "
          f"{db.table('fault').count()} fault sections")

    # --- point access (reference nshmdb.py:368-527) ----------------------
    info = db.get_fault_info(3, 1)
    print(f"fault 1: {info.name!r}, rake {info.rake:.1f}")
    fault = db.get_fault(3, 1)
    print(f"  {len(fault.planes)} plane(s); first corner "
          f"{fault.planes[0].corners[0].round(3).tolist()}")

    # --- the advanced membership-DSL query (reference nshmdb.py:623-683) --
    name = info.name
    hits = db.query(f"{name}", limit=5)
    print(f"top ruptures touching {name!r}:")
    for h in hits:
        print(f"  rupture {h.rupture_nshm_id}: M{h.magnitude:.2f}, "
              f"rate {h.rate:.2e}, {len(h.faults)} sections")

    # --- nearest-magnitude activity rates (reference nshmdb.py:165-248) ---
    r = hits[0]
    rates = db.most_likely_fault(r.fault_system, r.rupture_nshm_id, {name: 6.0})
    print(f"rate of {name!r} at nearest-≥ magnitude 6.0: {rates[name]:.2e}")

    # --- real ingest (reference: `nshmdb 1.0.4 out.db --api-key KEY`) -----
    # from nshm2022db_spark.sources import nshm_api
    # groups = nshm_api.group_source_ids(
    #     nshm_api.http_fetcher(API_KEY)(nshm_api.logic_tree_payload((1, 0, 4))))
    # landed = nshm_api.land_branch_zips(nshm_api.http_fetcher(API_KEY),
    #                                    urllib_download, groups, landing_dir)
    # db.insert_solution(nshm_api.composite_solution(spark, landed))

    spark.stop()


if __name__ == "__main__":
    main()
