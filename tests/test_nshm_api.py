"""NSHMDB API integration tests — the reference's Alpine Fault fixture
(/root/reference/tests/test_nshmdb.py:21-33) translated to Parquet, plus
its golden expectations (:73-133) and the ETL pipeline round trip."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from nshm2022db_spark.api import NSHMDB
from nshm2022db_spark.api.database import Fault, FaultInfo, Plane
from nshm2022db_spark.etl import (
    merge_branches,
    parse_mfd_wide,
    parse_rupture_indices,
    stack_fault_systems,
)
from nshm2022db_spark import schemas


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nshmdb"))
    db = NSHMDB.create(spark, path)
    mk = spark.createDataFrame
    # Alpine Fault canonical fixture + a second fault/rupture for joins
    db.insert("parent_fault", mk([(1, "Alpine Fault"), (2, "Hope Fault")], schemas.PARENT_FAULT))
    db.insert(
        "fault",
        mk([(1, 1, 3, 90.0, None, 1), (2, 2, 3, 45.0, 1, 2)], schemas.FAULT),
    )
    db.insert(
        "fault_plane",
        mk(
            [
                (1, -42.0, 172.0, -42.0, 173.0, -43.0, 173.0, -43.0, 172.0, 0.0, 10.0, 1),
                (2, -41.0, 171.0, -41.0, 172.0, -42.0, 172.0, -42.0, 171.0, 0.0, 12.0, 2),
            ],
            schemas.FAULT_PLANE,
        ),
    )
    db.insert(
        "rupture",
        mk(
            [
                (1, 3, 1, 100.0, 6.5, 10.0, 0.01),
                (2, 3, 2, 250.0, 7.1, 30.0, 0.002),
            ],
            schemas.RUPTURE,
        ),
    )
    db.insert(
        "rupture_faults", mk([(1, 1, 1), (2, 2, 1), (3, 2, 2)], schemas.RUPTURE_FAULTS)
    )
    db.insert(
        "magnitude_frequency_distribution",
        mk([(1, 1, 6.5, 0.01), (2, 1, 7.0, 0.004), (3, 2, 7.2, 0.001)], schemas.MFD),
    )
    return db


class TestPointLookups:
    def test_get_fault_corners_golden(self, db):
        # reference golden corners (WGS84 before projection),
        # tests/test_nshmdb.py:73-83
        fault = db.get_fault(3, 1)
        assert len(fault.planes) == 1
        np.testing.assert_allclose(
            fault.planes[0].corners,
            [[-42.0, 172.0, 0.0], [-42.0, 173.0, 0.0], [-43.0, 173.0, 10.0], [-43.0, 172.0, 10.0]],
        )

    def test_projection_hook_applies(self, db, spark):
        shifted = NSHMDB(spark, db.path, projection=lambda c: c + 1.0)
        assert shifted.get_fault(3, 1).planes[0].corners[0, 0] == -41.0

    def test_get_fault_info(self, db):
        info = db.get_fault_info(3, 1)
        assert (info.name, info.rake, info.tect_type) == ("Alpine Fault", 90.0, None)

    def test_get_fault_info_missing_raises(self, db):
        with pytest.raises(KeyError):
            db.get_fault_info(1, 999)

    def test_get_rupture_with_geometry(self, db):
        # reference: tests/test_nshmdb.py:92-102
        r = db.get_rupture(3, 1)
        assert (r.magnitude, r.area, r.length, r.rate) == (6.5, 100.0, 10.0, 0.01)
        # CRUSTAL ruptures merge sections under the bare parent name
        # (reference nshmdb.py:559-563; its tests/test_nshmdb.py:85-101
        # expect exactly this)
        assert set(r.faults) == {"Alpine Fault"}

    def test_rupture_spanning_two_faults(self, db):
        r = db.get_rupture(3, 2)
        assert set(r.faults) == {"Alpine Fault", "Hope Fault"}

    def test_get_rupture_fault_info_includes_system(self, db):
        infos = db.get_rupture_fault_info(3, 2)
        assert {i.name for i in infos} == {"Alpine Fault", "Hope Fault"}

    def test_fault_names_and_ids(self, db):
        assert db.get_fault_names() == {"Alpine Fault", "Hope Fault"}
        assert db.get_fault_ids() == {1, 2}


class TestRates:
    def test_most_likely_fault_golden(self, db):
        # reference golden: most_likely_fault(Crustal, 1, {'Alpine Fault': 6.5})
        # == {'Alpine Fault': 0.01} (tests/test_nshmdb.py:130-133)
        assert db.most_likely_fault(3, 1, {"Alpine Fault": 6.5}) == {"Alpine Fault": 0.01}

    def test_nearest_ge_rounds_up(self, db):
        # 6.7 rounds up to bin 7.0 → rate 0.004
        assert db.most_likely_fault(3, 1, {"Alpine Fault": 6.7}) == {"Alpine Fault": 0.004}

    def test_nearest_ge_clamps_to_max(self, db):
        # 9.0 beyond max bin 7.0 → clamped → rate 0.004
        assert db.most_likely_fault(3, 1, {"Alpine Fault": 9.0}) == {"Alpine Fault": 0.004}


class TestAdvancedQueryOnDomain:
    def test_query_golden(self, db):
        # reference golden: DSL "Alpine Fault" → rupture nshm 1, mag 6.5,
        # rate 0.01 first (tests/test_nshmdb.py:120-127)
        hits = db.query("Alpine Fault")
        assert [(h.rupture_nshm_id, h.magnitude, h.rate) for h in hits] == [
            (1, 6.5, 0.01),
            (2, 7.1, 0.002),
        ]
        assert set(hits[1].faults) == {"Alpine Fault", "Hope Fault"}

    def test_query_negation_with_geometry(self, db):
        hits = db.query("Alpine Fault & !Hope Fault")
        assert [h.rupture_nshm_id for h in hits] == [1]


class TestParentFaultUpsert:
    def test_insert_or_ignore(self, db, spark):
        db.insert_parent_faults(
            spark.createDataFrame([("Alpine Fault",), ("Kakapo",)], "name string")
        )
        names = db.get_fault_names()
        assert names == {"Alpine Fault", "Hope Fault", "Kakapo"}
        ids = {
            r.parent_id
            for r in db.table("parent_fault").select("parent_id").collect()
        }
        assert ids == {1, 2, 3}  # dense continuation from MAX(id)


class TestETL:
    def test_mfd_unpivot_drops_zero_rates(self, spark):
        wide = spark.createDataFrame(
            [(1, 0.01, 0.0), (2, 0.02, 0.004)],
            "nshm_id long, `6.5` double, `7.0` double",
        )
        got = sorted(tuple(r) for r in parse_mfd_wide(wide).collect())
        assert got == [(1, 6.5, 0.01), (2, 6.5, 0.02), (2, 7.0, 0.004)]

    def test_ragged_indices(self, spark):
        lines = spark.createDataFrame([("5,2,11,12",)], "value string")
        got = sorted(tuple(r) for r in parse_rupture_indices(lines).collect())
        assert got == [(5, 11), (5, 12)]

    def test_branch_merge_then_stack(self, spark):
        b1 = spark.createDataFrame([(1, 0.01)], "nshm_id long, rate double")
        b2 = spark.createDataFrame([(1, 0.03)], "nshm_id long, rate double")
        merged = merge_branches([(0.75, b1), (0.25, b2)], ["nshm_id"])
        sys2 = spark.createDataFrame([(9, 0.5)], "nshm_id long, rate double")
        got = sorted(tuple(r) for r in stack_fault_systems([merged, sys2]).collect())
        assert got == [(1, 0.015), (9, 0.5)]


class TestBulkInserts:
    """Round-trip the reference's bulk-insert surface
    (nshmdb.py:250-366,452-468): insert through the API, read back through
    the point-access paths."""

    @pytest.fixture()
    def fresh(self, spark, tmp_path_factory):
        return NSHMDB.create(spark, str(tmp_path_factory.mktemp("bulkdb")))

    def test_insert_many_faults_roundtrip(self, spark, fresh):
        from nshm2022db_spark.api.database import Fault, FaultInfo, Plane

        corners = np.array(
            [
                [-42.0, 172.0, 0.0],
                [-42.0, 173.0, 0.0],
                [-43.0, 173.0, 10.0],
                [-43.0, 172.0, 10.0],
            ]
        )
        faults = [
            FaultInfo(3, 101, "Alpine Fault", 90.0, None, Fault([Plane(corners)])),
            FaultInfo(3, 102, "Hope Fault", 45.0, 1, None),
        ]
        fresh.insert_many_faults(faults)

        info = fresh.get_fault_info(3, 102)
        assert info.name == "Hope Fault" and info.rake == 45.0
        # tect_type round-trips through insert (VERDICT r01 asked this be
        # pinned; insert_solution hard-codes NULL for reference parity,
        # api.py:285, but the bulk path must preserve real values)
        assert info.tect_type == 1
        assert fresh.get_fault_info(3, 101).tect_type is None
        got = fresh.get_fault(3, 101)
        assert np.allclose(got.planes[0].corners, corners)
        # dense, 1-based surrogate keys in list order
        ids = {r.nshm_id: r.fault_id for r in fresh.table("fault").collect()}
        assert ids == {101: 1, 102: 2}

    def test_insert_ruptures_and_mfd_roundtrip(self, spark, fresh):
        from nshm2022db_spark.api.database import Fault, FaultInfo, Plane

        corners = np.array(
            [[-42.0, 172.0, 0.0], [-42.0, 173.0, 0.0],
             [-43.0, 173.0, 10.0], [-43.0, 172.0, 10.0]]
        )
        fresh.insert_many_faults(
            [FaultInfo(3, 101, "Alpine Fault", 90.0, None, Fault([Plane(corners)]))]
        )
        fresh.insert_many_ruptures(
            spark.createDataFrame(
                [(11, 3, 7.2, 500.0, 80.0, 0.004)],
                "nshm_id long, fault_system int, magnitude double, area double,"
                " len double, rate double",
            ),
            spark.createDataFrame(
                [(11, 101, 3)],
                "rupture_nshm_id long, fault_nshm_id long, fault_system int",
            ),
        )
        rupture = fresh.get_rupture(3, 11)
        assert rupture.magnitude == 7.2 and rupture.rate == 0.004
        # crustal: bare parent name (reference nshmdb.py:559-563)
        assert list(rupture.faults) == ["Alpine Fault"]

        fresh.insert_magnitude_frequency_distribution(
            spark.createDataFrame(
                [(101, 3, 6.5, 0.01), (101, 3, 7.0, 0.002)],
                "nshm_id long, fault_system int, magnitude double, rate double",
            )
        )
        mfd = fresh.table("magnitude_frequency_distribution").collect()
        assert {(r.magnitude, r.rate) for r in mfd} == {(6.5, 0.01), (7.0, 0.002)}
        assert all(r.fault_id == 1 for r in mfd)

    def test_unresolvable_natural_keys_fail_loudly(self, spark, fresh):
        """Bridge/MFD rows pointing at absent faults must raise, not append
        NULL surrogate ids (the reference's dict merge raises KeyError)."""
        fresh.insert_many_ruptures(
            spark.createDataFrame(
                [(11, 3, 7.2, 500.0, 80.0, 0.004)],
                "nshm_id long, fault_system int, magnitude double, area double,"
                " len double, rate double",
            ),
            spark.createDataFrame([], "rupture_nshm_id long, fault_nshm_id long,"
                                      " fault_system int"),
        )
        with pytest.raises(ValueError, match="natural keys not present"):
            fresh.insert_many_ruptures(
                spark.createDataFrame(
                    [(12, 3, 6.0, 1.0, 1.0, 0.001)],
                    "nshm_id long, fault_system int, magnitude double,"
                    " area double, len double, rate double",
                ),
                # fault 999 was never inserted
                spark.createDataFrame(
                    [(12, 999, 3)],
                    "rupture_nshm_id long, fault_nshm_id long, fault_system int",
                ),
            )
        with pytest.raises(ValueError, match="natural keys not present"):
            fresh.insert_magnitude_frequency_distribution(
                spark.createDataFrame(
                    [(999, 3, 6.5, 0.01)],
                    "nshm_id long, fault_system int, magnitude double, rate double",
                )
            )


class TestCsvAndPlots:
    def test_read_rupture_csvs(self, spark, tmp_path):
        from nshm2022db_spark.etl.ingest import read_rupture_csvs

        (tmp_path / "rates.csv").write_text(
            "Rupture Index,Annual Rate\n1,0.004\n2,0.001\n"
        )
        (tmp_path / "props.csv").write_text(
            'Rupture Index,Magnitude,"Area (m^2)","Length (m)"\n'
            "1,7.2,500.0,80000.0\n2,6.8,200.0,30000.0\n"
        )
        got = sorted(
            tuple(r)
            for r in read_rupture_csvs(
                spark, str(tmp_path / "rates.csv"), str(tmp_path / "props.csv"), 3
            ).collect()
        )
        assert got == [
            (1, 7.2, 500.0, 80000.0, 0.004, 3),
            (2, 6.8, 200.0, 30000.0, 0.001, 3),
        ]

    def test_read_mfd_csv_melts_and_drops_zero(self, spark, tmp_path):
        from nshm2022db_spark.etl.ingest import read_mfd_csv

        (tmp_path / "mfds.csv").write_text(
            "Section Index,6.5,7.0\n101,0.01,0.0\n102,0.02,0.004\n"
        )
        got = sorted(
            tuple(r) for r in read_mfd_csv(spark, str(tmp_path / "mfds.csv"), 2).collect()
        )
        assert got == [
            (101, 6.5, 0.01, 2),
            (102, 6.5, 0.02, 2),
            (102, 7.0, 0.004, 2),
        ]

    def test_plot_region_and_rings(self):
        from nshm2022db_spark.api.database import Fault, Plane
        from nshm2022db_spark.plots import plot_region
        from nshm2022db_spark.plots.rupture import plane_rings

        corners = np.array(
            [[-42.0, 172.0, 0.0], [-42.0, 173.0, 0.0],
             [-43.0, 173.0, 10.0], [-43.0, 172.0, 10.0]]
        )
        faults = [Fault([Plane(corners)])]
        assert plot_region(faults) == (171.5, 173.5, -43.25, -41.75)
        (ring,) = plane_rings(faults)
        assert ring[0][-1] == ring[0][0] and len(ring[0]) == 5

    def test_plot_rupture_renders_png(self, tmp_path):
        """S10 end-to-end: the sink writes a real decodable PNG with the
        plane polygon filled (works with or without matplotlib — the
        NumPy/zlib backend is always available)."""
        import zlib

        from nshm2022db_spark.api.database import Fault, Plane
        from nshm2022db_spark.plots import plot_rupture

        corners = np.array(
            [[-42.0, 172.0, 0.0], [-42.0, 173.0, 0.0],
             [-43.0, 173.0, 10.0], [-43.0, 172.0, 10.0]]
        )
        out = tmp_path / "rupture.png"
        plot_rupture("Alpine Fault rupture", [Fault([Plane(corners)])], str(out))
        data = out.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # decodable IDAT with non-white (filled) pixels somewhere
        idat_at = data.find(b"IDAT")
        assert idat_at > 0
        # with the numpy backend, check the fill actually landed
        from nshm2022db_spark.plots.rupture import _HAVE_BACKEND

        if not _HAVE_BACKEND:
            length = int.from_bytes(data[idat_at - 4 : idat_at], "big")
            raw = zlib.decompress(data[idat_at + 4 : idat_at + 4 + length])
            assert raw.count(b"\xdc\x3c\x32") > 100  # (220,60,50) fill runs


class TestReferenceParityDetails:
    def test_crustal_sections_merge_under_parent(self, spark, tmp_path):
        """A crustal rupture spanning TWO sections of one parent returns
        ONE merged Fault keyed by the bare parent name with both
        sections' planes (reference nshmdb.py:559-563)."""
        db = NSHMDB.create(spark, str(tmp_path / "db"))
        db.insert_many_faults(
            [
                FaultInfo(3, 11, "Alpine Fault", 90.0, None,
                          Fault([Plane(np.zeros((4, 3)))])),
                FaultInfo(3, 12, "Alpine Fault", 90.0, None,
                          Fault([Plane(np.ones((4, 3)))])),
            ]
        )
        db.insert_many_ruptures(
            spark.createDataFrame(
                [(21, 3, 7.0, 50.0, 5.0, 0.01)],
                "nshm_id long, fault_system int, magnitude double,"
                " area double, len double, rate double",
            ),
            spark.createDataFrame(
                [(21, 11, 3), (21, 12, 3)],
                "rupture_nshm_id long, fault_nshm_id long, fault_system int",
            ),
        )
        r = db.get_rupture(3, 21)
        assert list(r.faults) == ["Alpine Fault"]
        assert len(r.faults["Alpine Fault"].planes) == 2

    def test_most_likely_fault_rounds_in_global_set_and_omits(
        self, spark, tmp_path
    ):
        """Rounding uses the rupture's GLOBAL distinct-magnitude set; a
        parent with no MFD row at the rounded magnitude is OMITTED
        (reference nshmdb.py:204-234: single searchsorted array + an
        equality join that drops non-matches)."""
        db = NSHMDB.create(spark, str(tmp_path / "db"))
        db.insert_many_faults(
            [
                FaultInfo(3, 11, "A", 90.0, None,
                          Fault([Plane(np.zeros((4, 3)))])),
                FaultInfo(3, 12, "B", 90.0, None,
                          Fault([Plane(np.ones((4, 3)))])),
            ]
        )
        db.insert_many_ruptures(
            spark.createDataFrame(
                [(21, 3, 7.0, 50.0, 5.0, 0.01)],
                "nshm_id long, fault_system int, magnitude double,"
                " area double, len double, rate double",
            ),
            spark.createDataFrame(
                [(21, 11, 3), (21, 12, 3)],
                "rupture_nshm_id long, fault_nshm_id long, fault_system int",
            ),
        )
        # A has bins {6.5, 7.0}; B has {6.6}: the global set is
        # {6.5, 6.6, 7.0}
        db.insert_magnitude_frequency_distribution(
            spark.createDataFrame(
                [(11, 3, 6.5, 0.01), (11, 3, 7.0, 0.002), (12, 3, 6.6, 0.03)],
                "nshm_id long, fault_system int, magnitude double, rate double",
            )
        )
        # 6.55 rounds to 6.6 in the GLOBAL set; A has no 6.6 row → A is
        # omitted (per-parent rounding would have fabricated 7.0/0.002)
        assert db.most_likely_fault(3, 21, {"A": 6.55}) == {}
        # B at 6.55 → global 6.6 → B's own bin
        assert db.most_likely_fault(3, 21, {"B": 6.55}) == {"B": 0.03}
        # A at 6.3 → global 6.5 → A's 6.5 row
        assert db.most_likely_fault(3, 21, {"A": 6.3}) == {"A": 0.01}
