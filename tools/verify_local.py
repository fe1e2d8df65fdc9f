"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the same sf dir, then compares: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats compared to 1e-9 relative). Exit 1 on any mismatch.

Usage: python tools/verify_local.py [--bare] [sf_dir] [name ...]

``--bare`` builds a minimal SparkSession with NONE of the session
factory's confs — replicating the driver's own conf-less session, the
exact gap that made the events queries red in rounds 1-2 (the read
layer must set every conf it depends on at read time).
"""

from __future__ import annotations

import math
import sys
from datetime import datetime, timezone

import duckdb

sys.path.insert(0, "/root/repo")

from nshm2022db_spark.schemas import STAR_TABLES  # noqa: E402
from nshm2022db_spark.session import get_spark  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None) if v.tzinfo in (None, timezone.utc) else v.astimezone(timezone.utc).replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "asDict"):  # pyspark Row
        v = v.asDict()
    if isinstance(v, dict):
        # struct columns: Spark Rows and DuckDB dicts normalize to the
        # same sorted (key, value) tuple so they can actually compare
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _sort_key_scalar(x):
    # floats sort on a COARSE rounding (well inside the 1e-9 compare
    # tolerance): sorting on exact values would let two engines order
    # near-equal floats oppositely and zip semantically-equal rows
    # against the wrong partners
    if isinstance(x, float):
        return (x is None, "float", round(x, 6))
    return (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x))


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(r[i]) for i in order) for r in rows],
        key=lambda t: tuple(_sort_key_scalar(x) for x in t),
    )


_INT_NAMES = {
    "tinyint", "smallint", "int", "integer", "bigint",
    "utinyint", "usmallint", "uinteger", "ubigint",
}
_FLOAT_NAMES = {"float", "real", "double"}


def type_family(type_str: str) -> str:
    """Collapse a Spark dtype string or DuckDB logical-type string into a
    comparable family. The driver's value hash is typed (Arrow-level), so a
    DuckDB HUGEINT (arrow decimal128) vs a Spark bigint (arrow int64) fails
    the driver hash even when every value matches — exactly the r4
    multimodal wsum bug (VERDICT r04 #1/#2). Int widths collapse to one
    family; decimal/hugeint is its own family so those leaks go red locally.
    """
    t = type_str.strip().lower()
    if t.endswith("[]"):
        return f"list<{type_family(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{type_family(t[6:-1])}>"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t.startswith("decimal") or t in ("hugeint", "uhugeint"):
        return "decimal"
    if t in _INT_NAMES:
        return "int"
    if t in _FLOAT_NAMES:
        return "float"
    if t in ("varchar", "string", "text"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("blob", "binary", "bytea"):
        return "bytes"
    return t


def schema_type_mismatches(spark_dtypes, duck_cols, duck_types):
    """Per-column family comparison between a Spark DataFrame's dtypes
    (``df.dtypes`` pairs) and a DuckDB relation's ``.columns``/``.types``.
    Returns a list of human-readable mismatch strings (empty = clean).
    Matches by column name; columns missing on either side are reported by
    the caller's column-set check, not here."""
    sfam = {name: type_family(dt) for name, dt in spark_dtypes}
    out = []
    for name, dt in zip(duck_cols, duck_types):
        if name not in sfam:
            continue
        dfam = type_family(str(dt))
        if sfam[name] != dfam:
            out.append(f"{name}: spark {sfam[name]} vs duckdb {dfam} ({dt})")
    return out


def _values_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    args = sys.argv[1:]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            # keep FAIL lines greppable: progress bars interleave \r into
            # stdout and can swallow result lines in piped output
            .config("spark.ui.showConsoleProgress", "false")
            .appName("verify_bare")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify_local")

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            # a typo'd subset previously ran ZERO queries and still
            # printed a full-registry green — the worst kind of gate
            print(f"FAIL unknown query names: {unknown}")
            return 1
    selected = [n for n in qs if not only or n in only]
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            dtypes = [str(t) for t in res.types]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        typed = schema_type_mismatches(sdf.dtypes, dcols, dtypes)
        if typed:
            problems.append("typed-schema " + "; ".join(typed))
        if not problems:
            sset, dset = _rowset(srows, scols), _rowset(drows, dcols)
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sset, dset))
                if not _values_close(a, b)
            ]
            if bad:
                i, a, b = bad[0]
                problems.append(f"{len(bad)} differing rows; first at sorted idx {i}:\n  spark : {a}\n  duckdb: {b}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match oracle")

    label = "selected " if only else ""
    print(
        f"\n{len(selected) - len(failures)}/{len(selected)} "
        f"{label}queries pass"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
