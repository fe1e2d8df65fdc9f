"""S4/S5 source tests: GraphQL payload/response parsing with canned JSON,
and the full land → extract → weighted-composite pipeline over synthetic
branch zips with an injected fetcher/downloader — no network anywhere."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from nshm2022db_spark.sources import nshm_api as api


def test_parse_version():
    assert api.parse_version("1.0.4") == (1, 0, 4)
    assert api.parse_version("2.1") == (2, 1, 0)
    with pytest.raises(ValueError, match="Invalid version"):
        api.parse_version("1.x.4")


def test_logic_tree_payload_version_format():
    p = api.logic_tree_payload((1, 0, 4))
    assert p["variables"]["version"] == "NSHM_v1.0.4"
    assert "source_logic_tree" in p["query"]


def test_group_source_ids_dedups_and_groups():
    response = {
        "data": {
            "get_model": {
                "source_logic_tree": {
                    "branch_sets": [
                        {
                            "short_name": "CRU",
                            "branches": [
                                {"weight": 0.75, "sources": [{"inversion_id": "A"}]},
                                {"weight": 0.25, "sources": [{"inversion_id": "B"},
                                                             {"inversion_id": "A"}]},
                            ],
                        },
                        {"short_name": None, "branches": []},
                        {
                            "short_name": "HIK",
                            "branches": [
                                {"weight": 1.0, "sources": [{"__typename": "X"}]},
                            ],
                        },
                    ]
                }
            }
        }
    }
    got = api.group_source_ids(response)
    assert got == {"CRU": [(0.75, "A"), (0.25, "B")]}


def test_extract_download_url_error_message():
    with pytest.raises(ValueError, match="Invalid solution id: n123"):
        api.extract_download_url({"data": {"node": {}}}, "n123")
    ok = {"data": {"node": {"file_url": "https://x/y.zip", "file_name": "y.zip"}}}
    assert api.extract_download_url(ok, "n") == "https://x/y.zip"


def _make_branch_zip(path: str, rate_a: float, rate_b: float) -> None:
    """A minimal solution zip: 2 faults, 2 ruptures, MFDs."""
    geojson = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[172.0, -42.0], [172.1, -41.95]],
                },
                "properties": {
                    "FaultID": 7,
                    "ParentName": "Alpine Fault",
                    "Rake": 180.0,
                    "DipDeg": 50.0,
                    "DipDir": 150.0,
                    "UpDepth": 0.0,
                    "LowDepth": 12.0,
                },
            }
        ],
    }
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(api.FAULT_INFORMATION_PATH, json.dumps(geojson))
        zf.writestr(api.RUPTURE_FAULT_JOIN_PATH, "101,1,7\n102,1,7\n")
        zf.writestr(
            api.RUPTURE_RATES_PATH,
            f"Rupture Index,Annual Rate\n101,{rate_a}\n102,{rate_b}\n",
        )
        zf.writestr(
            api.RUPTURE_PROPERTIES_PATH,
            'Rupture Index,Magnitude,"Area (m^2)","Length (m)"\n'
            "101,7.2,500.0,80000.0\n102,6.8,200.0,30000.0\n",
        )
        zf.writestr(
            api.MFDS_PATH,
            f"Section Index,6.5,7.0\n7,{rate_a},0.0\n",
        )


def test_land_and_composite_pipeline(spark, tmp_path):
    zips = {}
    for node_id, (ra, rb) in {
        "nA": (0.01, 0.002),
        "nB": (0.03, 0.004),
    }.items():
        p = str(tmp_path / f"{node_id}.zip")
        _make_branch_zip(p, ra, rb)
        zips[f"https://files/{node_id}.zip"] = p

    def fetcher(payload: dict) -> dict:
        node_id = payload["variables"]["id"]
        return {"data": {"node": {"file_url": f"https://files/{node_id}.zip"}}}

    def download(url: str, dest: str) -> None:
        with open(zips[url], "rb") as src, open(dest, "wb") as dst:
            dst.write(src.read())

    landing = str(tmp_path / "landing")
    landed = api.land_branch_zips(
        fetcher,
        download,
        {"CRU": [(0.75, "nA"), (0.25, "nB")]},
        landing,
    )
    assert list(landed) == ["CRU"] and len(landed["CRU"]) == 2
    # zips are deleted after extraction (disk bounded like the reference
    # bounds memory)
    assert not any(
        f.endswith(".zip")
        for _, _, files in os.walk(landing)
        for f in files
    )

    sol = api.composite_solution(spark, landed)
    props = {r.nshm_id: r for r in sol["rupture_properties"].collect()}
    # Σ wᵢ·rateᵢ: 0.75·0.01 + 0.25·0.03 = 0.015 ; 0.75·0.002 + 0.25·0.004
    assert props[101].rate == pytest.approx(0.015)
    assert props[102].rate == pytest.approx(0.0025)
    assert props[101].magnitude == 7.2  # invariant cols from first branch
    assert props[101].fault_system == 3  # "Alpine Fault" → Crustal

    joins = sorted(
        (r.rupture_id, r.fault_id) for r in sol["rupture_join_table"].collect()
    )
    assert joins == [(101, 7), (102, 7)]

    mfd = {r.magnitude: r.rate for r in
           sol["magnitude_frequency_distribution"].collect()}
    # zero-rate 7.0 bin dropped; weighted 6.5 bin
    assert set(mfd) == {6.5} and mfd[6.5] == pytest.approx(0.015)

    faults = sol["faults"].collect()
    assert faults[0].fault_nshm_id == 7 and faults[0].dip == 50.0


def test_composite_solution_empty_raises(spark):
    with pytest.raises(ValueError, match="No solutions to stack"):
        api.composite_solution(spark, {"CRU": []})


def test_insert_solution_end_to_end(spark, tmp_path):
    """Landed zips → composite_solution → NSHMDB.insert_solution →
    point-access reads; the full distributed ingest path."""
    from nshm2022db_spark.api import NSHMDB

    zips = {}
    for node_id, (ra, rb) in {"nA": (0.01, 0.002), "nB": (0.03, 0.004)}.items():
        p = str(tmp_path / f"{node_id}.zip")
        _make_branch_zip(p, ra, rb)
        zips[f"https://files/{node_id}.zip"] = p

    def fetcher(payload):
        nid = payload["variables"]["id"]
        return {"data": {"node": {"file_url": f"https://files/{nid}.zip"}}}

    def download(url, dest):
        with open(zips[url], "rb") as s, open(dest, "wb") as d:
            d.write(s.read())

    landed = api.land_branch_zips(
        fetcher, download, {"CRU": [(0.75, "nA"), (0.25, "nB")]},
        str(tmp_path / "landing"),
    )
    sol = api.composite_solution(spark, landed)

    db = NSHMDB.create(spark, str(tmp_path / "soldb"))
    db.insert_solution(sol)

    info = db.get_fault_info(3, 7)
    assert info.name == "Alpine Fault" and info.rake == 180.0
    fault = db.get_fault(3, 7)
    assert len(fault.planes) == 1  # 2-point trace -> 1 segment
    # top edge echoes the trace (lat, lon, depth)
    import numpy as np

    assert np.allclose(fault.planes[0].corners[0], [-42.0, 172.0, 0.0])

    r = db.get_rupture(3, 101)
    assert r.rate == pytest.approx(0.015) and r.magnitude == 7.2
    # crustal system: bare parent name (reference nshmdb.py:559-563)
    assert list(r.faults) == ["Alpine Fault"]

    rates = db.most_likely_fault(3, 101, {"Alpine Fault": 6.0})
    assert rates["Alpine Fault"] == pytest.approx(0.015)  # 6.5 bin, weighted
