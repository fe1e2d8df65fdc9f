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
    pairs (reference S7, api.py:362-398: hand loop + np.repeat).

    Spark-first: split once, take element 0 as the id, explode the slice
    after column 2 — all codegen'd, no Python in the loop."""
    parts = F.split(F.col(line_col), ",")
    return (
        lines.select(
            parts.getItem(0).cast("long").alias("rupture_id"),
            F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0))).alias("__faults"),
        )
        .select(
            "rupture_id",
            F.explode("__faults").alias("__f"),
        )
        .select("rupture_id", F.trim(F.col("__f")).cast("long").alias("fault_id"))
    )
