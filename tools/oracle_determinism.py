"""Fresh-process determinism stress for DuckDB oracle SQL.

Why: DuckDB 1.0.0's `list_reduce` over a GROUPED list column (one built
by `list(... ORDER BY ...)` in a GROUP BY) is nondeterministic under
parallel execution — ~1-in-3 FRESH PROCESSES returned a different
funnel_step for one session at sf0.1 (caught by the r4 sf0.1 verify
gate; the in-process result was stable, so only a process-per-trial
harness sees it). The session_funnel oracle was rewritten lambda-free.

The hazard needs BOTH ingredients:
  * a lambda fold whose input list comes from a grouped aggregation
    (folds over per-row computed lists — duck_dot, duck_char_hash,
    the shingle transforms — stressed 12/12 clean), and
  * enough grouped rows to span parallel morsels (knn_ivf retains the
    shape but folds over an 8-row centroid CTE — single morsel —
    stressed 12/12 clean).

This tool re-runs any oracle N times, each in a FRESH python process
(thread pools, memory layout, and morsel scheduling re-randomize per
process), and reports the result-hash distribution. Anything other than
one hash per query is a red flag. Run it when adding an oracle that
folds, groups lists, or samples.

Usage:
    python tools/oracle_determinism.py [-n TRIALS] [sf_dir] [name ...]
    # default: 12 trials at sf0.1 over the known hazardous-shape oracles
"""

from __future__ import annotations

import os
import subprocess
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Oracles that (still) contain lambda folds or grouped-list shapes, plus
# the one that actually flaked before its rewrite.
DEFAULT_NAMES = [
    "session_funnel",        # the r4 flake, now lambda-free — regression canary
    "knn_ivf",               # fold over grouped 8-row centroid list
    "bucket_by_cutpoints",   # list_filter over a grouped cut-point list
    "dedup_embedding_cosine",  # heaviest duck_dot user
    "dedup_ngram_jaccard",   # heaviest duck_char_hash user
    "text_quality_score",    # list_filter over per-row token lists
]

_CHILD = r"""
import sys, hashlib
sys.path.insert(0, {repo!r})
import duckdb
import __spark_entry__ as mod
from nshm2022db_spark.schemas import STAR_TABLES
osql = mod.oracle_sql()
con = duckdb.connect()
for t in STAR_TABLES:
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM '{sf}/{{t}}.parquet'")
for n in {names!r}:
    rows = sorted(map(repr, con.sql(osql[n]).fetchall()))
    m = hashlib.md5()
    for r in rows:
        m.update(r.encode())
    print("H", n, m.hexdigest()[:12], len(rows), flush=True)
"""


def main() -> int:
    args = sys.argv[1:]
    trials = 12
    if args and args[0] == "-n":
        trials = int(args[1])
        args = args[2:]
    sf = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_NAMES

    child = _CHILD.format(repo=REPO, sf=sf, names=names)
    seen: dict[str, Counter] = {n: Counter() for n in names}
    for t in range(trials):
        out = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True
        )
        if out.returncode != 0:
            print(out.stderr[-2000:])
            return 2
        for line in out.stdout.splitlines():
            if line.startswith("H "):
                _, name, h, nrows = line.split()
                seen[name][f"{h}/{nrows}rows"] += 1
        print(f"trial {t + 1}/{trials} done", flush=True)

    flaky = 0
    for name, dist in seen.items():
        status = "ok " if len(dist) == 1 else "FLAKY"
        flaky += len(dist) != 1
        print(f"{status} {name}: {dict(dist)}")
    return 1 if flaky else 0


if __name__ == "__main__":
    raise SystemExit(main())
