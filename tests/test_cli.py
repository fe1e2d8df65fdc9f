"""CLI ingest tests (reference scripts/nshm_db_generator.py:49-95): the
full version-parse → enumerate → land → composite → insert flow driven
through nshm2022db_spark.cli with injected transport — no network."""

from __future__ import annotations

import json

import pytest

from nshm2022db_spark import cli
from tests.test_nshm_source import _make_branch_zip


def _fake_transport(tmp_path):
    """(fetcher, download) pair serving a 1-branch-set, 2-branch logic
    tree out of synthetic zips on disk."""
    zips = {}
    for node_id, (ra, rb) in {"nA": (0.01, 0.002), "nB": (0.03, 0.004)}.items():
        p = str(tmp_path / f"{node_id}.zip")
        _make_branch_zip(p, ra, rb)
        zips[f"https://files/{node_id}.zip"] = p

    def fetcher(payload: dict) -> dict:
        if "source_logic_tree" in payload["query"]:
            assert payload["variables"]["version"] == "NSHM_v1.0.4"
            return {
                "data": {
                    "get_model": {
                        "source_logic_tree": {
                            "branch_sets": [
                                {
                                    "short_name": "CRU",
                                    "branches": [
                                        {"weight": 0.75,
                                         "sources": [{"inversion_id": "nA"}]},
                                        {"weight": 0.25,
                                         "sources": [{"inversion_id": "nB"}]},
                                    ],
                                }
                            ]
                        }
                    }
                }
            }
        nid = payload["variables"]["id"]
        return {"data": {"node": {"file_url": f"https://files/{nid}.zip"}}}

    def download(url: str, dest: str) -> None:
        with open(zips[url], "rb") as s, open(dest, "wb") as d:
            d.write(s.read())

    return fetcher, download


def test_parser_surface():
    p = cli.build_parser()
    args = p.parse_args(
        ["1.0.4", "/tmp/out", "--api-key", "k", "--skip-mfds-creation"]
    )
    assert args.version == "1.0.4" and args.api_key == "k"
    assert args.skip_mfds_creation and not args.skip_faults_creation


def test_missing_api_key_exits(monkeypatch, tmp_path):
    monkeypatch.delenv("NSHMDB_API_KEY", raising=False)
    with pytest.raises(SystemExit, match="API key"):
        cli.main(["1.0.4", str(tmp_path / "db")])


def test_run_ingest_end_to_end(spark, tmp_path):
    fetcher, download = _fake_transport(tmp_path)
    db = cli.run_ingest(
        spark,
        "1.0.4",
        str(tmp_path / "clidb"),
        fetcher=fetcher,
        download=download,
        landing_dir=str(tmp_path / "landing"),
    )
    r = db.get_rupture(3, 101)
    assert r.rate == pytest.approx(0.75 * 0.01 + 0.25 * 0.03)
    assert r.magnitude == 7.2
    assert db.table("magnitude_frequency_distribution").count() > 0


def test_run_ingest_skip_flags(spark, tmp_path):
    fetcher, download = _fake_transport(tmp_path)
    db = cli.run_ingest(
        spark,
        "1.0.4",
        str(tmp_path / "clidb2"),
        fetcher=fetcher,
        download=download,
        landing_dir=str(tmp_path / "landing2"),
        skip_mfds=True,
    )
    assert db.table("rupture").count() == 2
    assert db.table("magnitude_frequency_distribution").count() == 0
