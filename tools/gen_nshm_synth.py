"""Synthetic NSHM-domain dataset generator.

Builds a deterministic fault/rupture star schema at a configurable scale
(n_parents named parent faults → sections → quadrilateral planes;
ruptures spanning 1-8 contiguous sections with magnitude/area/len/rate;
per-section MFDs) and writes it through the NSHMDB API. The shape mirrors
the real model (reference README: ~71k ruptures, 3 fault systems,
2-level fault hierarchy) so domain queries run at realistic volume, not
just on the 2-row Alpine fixture.

Usage: python tools/gen_nshm_synth.py <out_dir> [n_parents] [n_ruptures]
"""

from __future__ import annotations

import sys

import numpy as np


def build(spark, out_dir: str, n_parents: int = 50, n_ruptures: int = 10_000):
    sys.path.insert(0, "/root/repo")
    from nshm2022db_spark.api import NSHMDB
    from nshm2022db_spark.api.database import Fault, FaultInfo, Plane

    rng = np.random.default_rng(20220101)
    db = NSHMDB.create(spark, out_dir, partition_facts=True)

    # sections: each parent fault splits into 2-12 sections along a strike
    faults: list[FaultInfo] = []
    nshm_id = 0
    for p in range(n_parents):
        system = int(rng.choice([1, 2, 3], p=[0.1, 0.1, 0.8]))
        n_sections = int(rng.integers(2, 13))
        lat0 = -47.0 + 10.0 * rng.random()
        lon0 = 166.5 + 11.0 * rng.random()
        strike = rng.uniform(0, 2 * np.pi)
        for s in range(n_sections):
            nshm_id += 1
            d = 0.12 * s
            corners = np.array(
                [
                    [lat0 + d * np.cos(strike), lon0 + d * np.sin(strike), 0.0],
                    [lat0 + (d + 0.12) * np.cos(strike), lon0 + (d + 0.12) * np.sin(strike), 0.0],
                    [lat0 + (d + 0.12) * np.cos(strike) + 0.05, lon0 + (d + 0.12) * np.sin(strike), 12.0],
                    [lat0 + d * np.cos(strike) + 0.05, lon0 + d * np.sin(strike), 12.0],
                ]
            )
            faults.append(
                FaultInfo(
                    fault_system=system,
                    fault_nshm_id=nshm_id,
                    name=f"Synthetic Fault {p}",
                    rake=float(rng.uniform(-180, 180)),
                    tect_type=int(rng.integers(0, 3)) if rng.random() > 0.2 else None,
                    fault=Fault([Plane(corners)]),
                )
            )
    db.insert_many_faults(faults)

    # ruptures: span 1-8 contiguous sections of one parent; 20% rateless
    by_parent: dict[str, list[FaultInfo]] = {}
    for f in faults:
        by_parent.setdefault(f.name, []).append(f)
    parents = list(by_parent)

    rupture_rows, bridge_rows = [], []
    for r in range(1, n_ruptures + 1):
        name = parents[int(rng.integers(0, len(parents)))]
        secs = by_parent[name]
        system = secs[0].fault_system
        start = int(rng.integers(0, len(secs)))
        span = secs[start : start + int(rng.integers(1, 9))]
        mag = float(rng.uniform(5.0, 9.0))
        rate = None if rng.random() < 0.2 else float(10 ** rng.uniform(-8, -2))
        rupture_rows.append(
            (r, system, mag, float(10 ** (mag - 3)), 12.0 * len(span), rate)
        )
        for f in span:
            bridge_rows.append((r, f.fault_nshm_id, system))

    db.insert_many_ruptures(
        spark.createDataFrame(
            rupture_rows,
            "nshm_id long, fault_system int, magnitude double, area double,"
            " len double, rate double",
        ),
        spark.createDataFrame(
            bridge_rows,
            "rupture_nshm_id long, fault_nshm_id long, fault_system int",
        ),
    )

    # MFDs: magnitude bins per section
    mfd_rows = []
    for f in faults:
        for b in range(int(rng.integers(3, 9))):
            mfd_rows.append(
                (f.fault_nshm_id, f.fault_system, round(5.0 + 0.5 * b, 1),
                 float(10 ** rng.uniform(-7, -3)))
            )
    db.insert_magnitude_frequency_distribution(
        spark.createDataFrame(
            mfd_rows, "nshm_id long, fault_system int, magnitude double, rate double"
        )
    )
    return db


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    from nshm2022db_spark.session import get_spark

    out = sys.argv[1]
    n_parents = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_ruptures = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    build(get_spark("gen_nshm_synth"), out, n_parents, n_ruptures)
    print(f"wrote synthetic NSHM db to {out}")
