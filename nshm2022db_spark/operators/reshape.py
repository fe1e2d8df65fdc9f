"""Reshaping operators — U2/U3/S7 in SURVEY §2.7.

unpivot: wide MFD CSV (one column per magnitude bin) → long
(id, magnitude, rate), reference api.py:316-319 (pandas melt).
explode: ragged rupture→fault lists → one row per pair, reference
api.py:362-398 (np.repeat over a hand-parsed ragged CSV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_wide(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str,
    value_name: str,
) -> DataFrame:
    """Wide → long. Spark's native ``unpivot`` (≥3.4) — one narrow
    projection per input row, no shuffle.

    Columns resolve via backticked expressions: MFD bin headers are
    literal floats like "6.5" and bare F.col/df[...] read the dot as a
    struct accessor."""

    def c(name: str):
        return F.expr(f"`{name.replace('`', '``')}`").alias(name)

    return df.unpivot(
        [c(x) for x in id_cols],
        [c(x) for x in value_cols],
        var_name,
        value_name,
    )


def explode_tokens(df: DataFrame, id_col: str, text_col: str, token_col: str = "token") -> DataFrame:
    """Split + explode: one row per whitespace token. The scale shape of the
    reference's ragged-list expansion — explode is pipelined inside the
    scan stage, no shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias(token_col),
    ).filter(F.col(token_col) != "")


def parse_ragged_indices(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Ragged CSV `rupture, n, fault_1..fault_n` → (rupture_id, fault_id)
    pairs (reference S7, api.py:362-398: hand loop + np.repeat, which
    SKIPS the header line and slices exactly ``n`` entries).

    Spark-first: split once, take element 0 as the id, explode the
    ``n``-bounded slice after column 2 — all codegen'd, no Python in the
    loop. Real solution files start with a 'Rupture Index,...' header
    and may pad rows with trailing empty cells: the id/cell try_casts
    drop both (under ANSI mode a plain cast would crash the whole
    ingest on the header), and the count bound ignores padding exactly
    as the reference's ``parts[2:2+n]`` does. A missing/invalid count
    falls back to everything-after-column-2."""
    parts = F.split(F.col(line_col), ",")
    n = F.coalesce(
        F.trim(parts.getItem(1)).try_cast("int"),
        (F.size(parts) - 2).cast("int"),
    )
    return (
        lines.select(
            parts.getItem(0).try_cast("long").alias("rupture_id"),
            F.slice(parts, F.lit(3), F.greatest(n, F.lit(0))).alias("__faults"),
        )
        .filter(F.col("rupture_id").isNotNull())
        .select(
            "rupture_id",
            F.explode("__faults").alias("__f"),
        )
        .select(
            "rupture_id", F.trim(F.col("__f")).try_cast("long").alias("fault_id")
        )
        .filter(F.col("fault_id").isNotNull())
    )
