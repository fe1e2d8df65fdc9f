"""Skew-handling join: explicit key salting.

AQE's skew-join split (on in session.py) handles moderate skew by
splitting oversized partitions, but it only helps sort-merge joins and
only after a shuffle has already materialized the skew. For the
pathological case — a handful of keys carrying a large fraction of a
100 TB fact table joined against a non-broadcastable right side — salting
restructures the shuffle itself: the big side scatters each row to one of
``n_salts`` sub-keys, the small side replicates each row to ALL sub-keys,
and the hot key's rows land on ``n_salts`` reducers instead of one.

Cost model: right side is duplicated ``n_salts`` times through the
shuffle — use only when right ≪ left but still above the broadcast
threshold, or salt only the known-hot keys (``hot_keys``) and join the
rest normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join on ``on`` with the left side's shuffle salted.

    With ``hot_keys`` (a small DataFrame of the skewed key values), only
    rows carrying those keys are salted/replicated; the remainder joins
    on the natural keys — the replication cost is then proportional to
    the hot subset, not the whole right side.

    Only left-preserving join types are supported: the right side is
    REPLICATED across all ``n_salts`` sub-keys, so any right-preserving
    type ('right', 'full', 'right_outer', ...) would emit every unmatched
    right row once per salt — silently wrong. Flip the sides and use
    'left' instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — unmatched right rows would be duplicated "
            f"n_salts={n_salts} times. Swap the sides instead."
        )
    if hot_keys is not None:
        hk = F.broadcast(hot_keys.select(*on).distinct())
        left_hot = left.join(hk, on, "left_semi")
        left_cold = left.join(hk, on, "left_anti")
        right_hot = right.join(hk, on, "left_semi")
        right_cold = right.join(hk, on, "left_anti")
        return salted_join(left_hot, right_hot, on, n_salts, how).unionByName(
            left_cold.join(right_cold, on, how)
        )

    salted_left = left.withColumn(
        _SALT, (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    replicated_right = right.select("*", salts)
    joined = salted_left.join(replicated_right, [*on, _SALT], how)
    return joined.drop(_SALT)


def top_frequency_keys(df: DataFrame, on: list[str], top_n: int = 10) -> DataFrame:
    """The ``top_n`` most frequent key values — feed as ``hot_keys``.
    One pass, map-side combined; at scale run on a sample instead
    (``df.sample(0.01)``) since heavy hitters survive sampling."""
    counts = df.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    return counts.orderBy(F.col("__n").desc()).limit(top_n).drop("__n")
