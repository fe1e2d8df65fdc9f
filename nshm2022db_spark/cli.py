"""Command-line ingest entry point (reference
scripts/nshm_db_generator.py:49-95, console script ``nshmdb`` in the
reference's pyproject.toml:42-43).

Same surface re-expressed for the Spark engine with stdlib argparse (the
reference uses typer, not available here): positional NSHM ``version``
and output ``db_path``, ``--api-key`` with the reference's
``NSHMDB_API_KEY`` environment fallback, and the three
``--skip-*-creation`` flags. The flow is the reference's:
version parse → logic-tree enumeration → per-branch zip landing →
weighted composite → bulk inserts — but the composite and every insert
run as Spark jobs (sources.nshm_api.composite_solution →
NSHMDB.insert_solution).

Transport is injectable (``fetcher``/``download`` arguments of
``run_ingest``) so tests drive the whole CLI against synthetic zips with
no network; ``main`` wires the real urllib transport.

Run as ``python -m nshm2022db_spark <version> <db_path> --api-key ...``.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import urllib.request
from collections.abc import Callable

from pyspark.sql import SparkSession

from nshm2022db_spark.api import NSHMDB
from nshm2022db_spark.sources.nshm_api import (
    Fetcher,
    composite_solution,
    group_source_ids,
    http_fetcher,
    land_branch_zips,
    logic_tree_payload,
    parse_version,
)


def _urllib_download(url: str, dest: str) -> None:
    with urllib.request.urlopen(url, timeout=120) as resp, open(dest, "wb") as f:
        while chunk := resp.read(1 << 20):
            f.write(chunk)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m nshm2022db_spark",
        description=(
            "Generate the NSHM2022 rupture database by downloading "
            "logic-tree solutions and compositing them with Spark."
        ),
    )
    p.add_argument("version", help='NSHM version to download, e.g. "1.0.4"')
    p.add_argument("db_path", help="Output database directory (parquet tables)")
    p.add_argument(
        "--api-key",
        default=os.environ.get("NSHMDB_API_KEY"),
        help="API key (default: NSHMDB_API_KEY environment variable)",
    )
    p.add_argument(
        "--landing-dir",
        default=None,
        help="Where branch zips are landed/extracted (default: temp dir)",
    )
    p.add_argument("--skip-faults-creation", action="store_true")
    p.add_argument("--skip-rupture-creation", action="store_true")
    p.add_argument("--skip-mfds-creation", action="store_true")
    return p


def run_ingest(
    spark: SparkSession,
    version: str,
    db_path: str,
    fetcher: Fetcher,
    download: Callable[[str, str], None],
    landing_dir: str | None = None,
    skip_faults: bool = False,
    skip_ruptures: bool = False,
    skip_mfds: bool = False,
) -> NSHMDB:
    """The CLI body with transport injected (tests pass fakes)."""
    nshm_version = parse_version(version)
    groups = group_source_ids(fetcher(logic_tree_payload(nshm_version)))
    landing = landing_dir or tempfile.mkdtemp(prefix="nshm_landing_")
    landed = land_branch_zips(fetcher, download, groups, landing)
    sol = composite_solution(spark, landed)
    db = NSHMDB.create(spark, db_path)
    db.insert_solution(
        sol,
        include_faults=not skip_faults,
        include_ruptures=not skip_ruptures,
        include_mfds=not skip_mfds,
    )
    return db


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.api_key:
        raise SystemExit(
            "an API key is required: pass --api-key or set NSHMDB_API_KEY"
        )
    from nshm2022db_spark.session import get_spark

    run_ingest(
        get_spark("nshm-ingest"),
        args.version,
        args.db_path,
        fetcher=http_fetcher(args.api_key),
        download=_urllib_download,
        landing_dir=args.landing_dir,
        skip_faults=args.skip_faults_creation,
        skip_ruptures=args.skip_rupture_creation,
        skip_mfds=args.skip_mfds_creation,
    )
    return 0
