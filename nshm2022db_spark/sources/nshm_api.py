"""NSHM GraphQL API source + composite-solution orchestration (S4/S5,
reference nshmdb/api.py:27-176,455-622).

The network surface is two GraphQL POSTs (logic-tree enumeration, per-node
download URL) and per-branch zip downloads — inherently driver-side
(SURVEY §2.1 S4/S5). Everything around them is pure and testable:

* payload builders and response parsers take/return plain dicts — no
  transport inside, so tests feed canned JSON;
* the transport is an injectable ``fetcher(payload) -> response`` callable
  (``http_fetcher`` builds the real urllib one; nothing here imports it
  implicitly — in this environment there is no network);
* the composite step is DataFrames end-to-end: per fault system, the
  invariant tables (faults, join table) parse from the first branch only
  (the reference's parse-once optimization, api.py:480-485) while the
  branch-varying rates fold through ONE union + hash aggregate
  (operators.weighted_branch_merge) instead of the reference's sequential
  in-memory accumulator (api.py:494-515) — partial aggregation is the
  principled form of that accumulator, and it parallelizes over branches
  and keys.
"""

from __future__ import annotations

import json
import os
import urllib.request
import zipfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nshm2022db_spark.operators import weighted_branch_merge
from nshm2022db_spark.operators.reshape import parse_ragged_indices
from nshm2022db_spark.schemas import FAULT_SYSTEMS

API_URL = "https://nshm-api.gns.cri.nz/weka-app-api/graphql"

# Solution-zip member layout (reference api.py:31-35)
FAULT_INFORMATION_PATH = "ruptures/fault_sections.geojson"
RUPTURE_FAULT_JOIN_PATH = "ruptures/indices.csv"
RUPTURE_RATES_PATH = "solution/rates.csv"
RUPTURE_PROPERTIES_PATH = "ruptures/properties.csv"
MFDS_PATH = "ruptures/sub_seismo_on_fault_mfds.csv"

# Fault-system sentinel parent names (reference api.py:37-38,179-198)
HIKURANGI_NAME = (
    "Hikurangi, Kermadec to Louisville ridge, 30km - with slip deficit "
    "smoothed near East Cape and locked near trench."
)
PUYSEGUR_NAME = "Puysegur, 15km, 50% coupling, corrected dip direction"

Fetcher = Callable[[dict], dict]


def parse_version(version: str) -> tuple[int, ...]:
    """F7 — "major.minor[.patch]" → int tuple (reference
    scripts/nshm_db_generator.py:40-46). Patch defaults to 0."""
    parts = version.split(".")
    if len(parts) not in (2, 3) or not all(p.isdigit() for p in parts):
        raise ValueError(f"Invalid version string: {version!r}")
    return tuple(int(p) for p in parts) + ((0,) if len(parts) == 2 else ())


def logic_tree_payload(version: tuple[int, ...]) -> dict:
    """GraphQL payload enumerating the source logic tree (reference
    api.py:61-81)."""
    major, minor, patch = version
    return {
        "query": """query LogicTreePageQuery($version: String!) {
          get_model(version: $version) {
            source_logic_tree {
              branch_sets {
                short_name
                branches {
                  weight
                  sources {
                    __typename
                    ... on BranchInversionSource { inversion_id }
                  }
                }
              }
            }
          }
        }""",
        "variables": {"version": f"NSHM_v{major}.{minor}.{patch}"},
    }


def download_link_payload(node_id: str) -> dict:
    """GraphQL payload resolving a node's file URL (reference
    api.py:136-146)."""
    return {
        "query": """query InversionSolutionQuery($id: ID!) {
          node(id: $id) {
            ... on FileInterface { file_name file_url }
          }
        }""",
        "variables": {"id": node_id},
    }


def group_source_ids(response: dict) -> dict[str, list[tuple[float, str]]]:
    """Branch-set short name → [(weight, inversion_id)], first occurrence
    of each id kept (reference api.py:88-111)."""
    out: dict[str, list[tuple[float, str]]] = {}
    seen: dict[str, set] = {}
    branch_sets = (
        response.get("data", {})
        .get("get_model", {})
        .get("source_logic_tree", {})
        .get("branch_sets", [])
    )
    for branch_set in branch_sets:
        short_name = branch_set.get("short_name")
        if not short_name:
            continue
        for branch in branch_set.get("branches", []):
            weight = branch["weight"]
            for source in branch.get("sources", []):
                inversion_id = source.get("inversion_id")
                if inversion_id and inversion_id not in seen.setdefault(short_name, set()):
                    out.setdefault(short_name, []).append((weight, inversion_id))
                    seen[short_name].add(inversion_id)
    return out


def extract_download_url(response: dict, node_id: str) -> str:
    """File URL out of the node response; ValueError on a miss (reference
    api.py:150-157 — same message)."""
    url = (response.get("data", {}).get("node", {}) or {}).get("file_url")
    if not url:
        raise ValueError(f"Invalid solution id: {node_id}")
    return url


def http_fetcher(api_key: str, url: str = API_URL, timeout: int = 30) -> Fetcher:
    """Real transport: POST a GraphQL payload with the X-API-KEY header.
    Driver-side by nature; built on stdlib urllib (no extra deps)."""

    def fetch(payload: dict) -> dict:
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", "X-API-KEY": api_key},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read())

    return fetch


def land_branch_zips(
    fetcher: Fetcher,
    download: Callable[[str, str], None],
    groups: dict[str, list[tuple[float, str]]],
    landing_dir: str,
) -> dict[str, list[tuple[float, str]]]:
    """Resolve every branch's download URL and land its zip under
    ``landing_dir`` (S5). ``download(url, dest_path)`` is injectable like
    the fetcher. Returns short_name → [(weight, extracted_dir)]; each zip
    is extracted immediately and deleted, bounding disk to one zip at a
    time per branch (the reference bounds MEMORY the same way,
    api.py:565-592)."""
    landed: dict[str, list[tuple[float, str]]] = {}
    for short_name, branches in groups.items():
        for i, (weight, node_id) in enumerate(branches):
            url = extract_download_url(fetcher(download_link_payload(node_id)), node_id)
            branch_dir = os.path.join(landing_dir, short_name, f"branch_{i}")
            os.makedirs(branch_dir, exist_ok=True)
            zip_path = os.path.join(branch_dir, "solution.zip")
            download(url, zip_path)
            extract_solution_members(zip_path, branch_dir)
            os.remove(zip_path)
            landed.setdefault(short_name, []).append((weight, branch_dir))
    return landed


def extract_solution_members(zip_path: str, out_dir: str) -> None:
    """Pull the five solution members (reference api.py:31-35) out of a
    branch zip; missing optional members (MFDs) are skipped."""
    members = [
        FAULT_INFORMATION_PATH,
        RUPTURE_FAULT_JOIN_PATH,
        RUPTURE_RATES_PATH,
        RUPTURE_PROPERTIES_PATH,
        MFDS_PATH,
    ]
    with zipfile.ZipFile(zip_path) as zf:
        names = set(zf.namelist())
        for m in members:
            if m in names:
                zf.extract(m, out_dir)


def infer_fault_system(faults: DataFrame) -> int:
    """Fault system from the first feature's ParentName (reference
    api.py:179-198): the two subduction interfaces carry sentinel names,
    everything else is Crustal."""
    name = faults.select("name").first()["name"]
    if name == HIKURANGI_NAME:
        return FAULT_SYSTEMS["Hikurangi"]
    if name == PUYSEGUR_NAME:
        return FAULT_SYSTEMS["Puysegur"]
    return FAULT_SYSTEMS["Crustal"]


def merge_branch_dirs(
    spark: SparkSession, branches: list[tuple[float, str]]
) -> dict[str, DataFrame | None]:
    """One fault system's weighted composite from landed branch dirs
    (reference _merge_branches, api.py:455-522).

    Invariant tables (faults, join table, non-rate properties) come from
    the FIRST branch; rates and MFD rates are Σ weightᵢ·rateᵢ across all
    branches via union + one hash aggregate."""
    from nshm2022db_spark.etl.ingest import read_mfd_csv, read_rupture_csvs
    from nshm2022db_spark.sources.geojson import read_fault_geojson

    _, first_dir = branches[0]
    faults = read_fault_geojson(
        spark, os.path.join(first_dir, FAULT_INFORMATION_PATH)
    )
    fault_system = infer_fault_system(faults)
    join_table = parse_ragged_indices(
        spark.read.text(os.path.join(first_dir, RUPTURE_FAULT_JOIN_PATH))
    )

    def props_of(d: str) -> DataFrame:
        return read_rupture_csvs(
            spark,
            os.path.join(d, RUPTURE_RATES_PATH),
            os.path.join(d, RUPTURE_PROPERTIES_PATH),
            fault_system,
        )

    first_props = props_of(first_dir)
    # reuse first_props for branch 0 — props_of(first_dir) would scan
    # and join its two CSVs a second time
    merged_rates = weighted_branch_merge(
        [(branches[0][0], first_props.select("nshm_id", "rate"))]
        + [
            (w, props_of(d).select("nshm_id", "rate"))
            for w, d in branches[1:]
        ],
        ["nshm_id"],
    )
    properties = first_props.drop("rate").join(merged_rates, "nshm_id")

    mfd_path = os.path.join(first_dir, MFDS_PATH)
    mfds = None
    if os.path.exists(mfd_path):
        mfds = weighted_branch_merge(
            [
                (
                    w,
                    read_mfd_csv(spark, os.path.join(d, MFDS_PATH), fault_system),
                )
                for w, d in branches
            ],
            ["nshm_id", "magnitude", "fault_system"],
        )

    return {
        "faults": faults.withColumn("fault_system", F.lit(fault_system)),
        "rupture_join_table": join_table.withColumn(
            "fault_system", F.lit(fault_system)
        ),
        "rupture_properties": properties,
        "magnitude_frequency_distribution": mfds,
    }


def composite_solution(
    spark: SparkSession, landed: dict[str, list[tuple[float, str]]]
) -> dict[str, DataFrame | None]:
    """Stack every fault system's composite (reference
    download_composite_solution + _stack_fault_systems, api.py:525-622)."""
    if not any(landed.values()):
        raise ValueError("No solutions to stack.")
    parts = [
        merge_branch_dirs(spark, branches)
        for branches in landed.values()
        if branches
    ]
    out: dict[str, DataFrame | None] = {}
    for key in (
        "faults",
        "rupture_join_table",
        "rupture_properties",
        "magnitude_frequency_distribution",
    ):
        frames = [p[key] for p in parts if p[key] is not None]
        combined = None
        for f in frames:
            combined = f if combined is None else combined.unionByName(f)
        out[key] = combined
    return out
