"""Domain-scale smoke: the NSHM API surface at realistic volume (synthetic
~30 parents / 5k ruptures / ~20k bridge rows), not the 2-row fixture.
Internal consistency is asserted against independent DataFrame
recomputations of the same answers."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def synth_db(spark, tmp_path_factory):
    from gen_nshm_synth import build

    return build(
        spark,
        str(tmp_path_factory.mktemp("nshm_synth")),
        n_parents=30,
        n_ruptures=5_000,
    )


def test_volume_and_partitioning(synth_db):
    assert synth_db.table("rupture").count() == 5_000
    assert synth_db.table("fault").count() > 60
    assert synth_db.table("rupture_faults").count() > 5_000
    systems = {
        r.fault_system for r in synth_db.table("rupture").select("fault_system").distinct().collect()
    }
    assert systems <= {1, 2, 3} and len(systems) >= 2


def test_query_dsl_on_domain_volume(synth_db):
    # top-rate ruptures touching parent 0 but not parent 1
    hits = synth_db.query("Synthetic Fault 0 & !Synthetic Fault 1", limit=25)
    assert 0 < len(hits) <= 25
    # rates are non-null, descending, and the membership condition holds
    rates = [h.rate for h in hits]
    assert all(r is not None for r in rates)
    assert rates == sorted(rates, reverse=True)
    for h in hits[:5]:
        parents = {name.split(": Section")[0] for name in h.faults}
        assert "Synthetic Fault 0" in parents
        assert "Synthetic Fault 1" not in parents

    # cross-check the top hit against an independent DataFrame computation
    db = synth_db
    bridge = db.table("rupture_faults")
    fault = db.table("fault")
    parent = db.table("parent_fault")
    memb = (
        bridge.join(fault, "fault_id")
        .join(parent, "parent_id")
        .groupBy("rupture_id")
        .agg(
            F.bool_or(F.col("name") == "Synthetic Fault 0").alias("has0"),
            F.bool_or(F.col("name") == "Synthetic Fault 1").alias("has1"),
        )
        .filter(F.col("has0") & ~F.col("has1"))
    )
    expected_top = (
        db.table("rupture")
        .filter(F.col("rate").isNotNull())
        .join(memb, "rupture_id")
        .orderBy(F.col("rate").desc())
        .first()
    )
    assert hits[0].rate == expected_top.rate


def test_most_likely_fault_on_domain_volume(synth_db):
    db = synth_db
    # pick a rupture with an MFD-bearing section
    r = db.table("rupture").filter(F.col("rate").isNotNull()).first()
    infos = db.get_rupture_fault_info(r.fault_system, r.nshm_id)
    name = infos[0].name
    rates = db.most_likely_fault(r.fault_system, r.nshm_id, {name: 6.0})
    assert name in rates and rates[name] > 0
