"""SURVEY §2 relational operator inventory on the driver star schema.

Each entry is a Spark DataFrame plan plus a semantically identical DuckDB
oracle (registered via registry.register). Role mapping per FIXTURES.md §B:
orders↔rupture (fact), lineitem↔rupture_faults (bridge), part↔fault,
nation/region↔parent_fault hierarchy.

Float discipline: money-sum aggregates are ROUND(x, 2) on both sides —
the two engines sum doubles in different orders; 2-decimal rounding leaves
~1e-6 headroom over the worst-case partial-sum drift at sf≤0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nshm2022db_spark.operators import (
    dense_surrogate_keys,
    explode_tokens,
    nearest_ge_lookup,
    nearest_ge_lookup_per_key,
    top_k,
    unpivot_wide,
    upsert_missing,
    weighted_branch_merge,
)
from nshm2022db_spark.operators.reshape import parse_ragged_indices
from nshm2022db_spark.functions.timecols import epoch_us
from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table


# ---------------------------------------------------------------------------
# §2.1 scans / §2.2 projections & predicates
# ---------------------------------------------------------------------------


@register("scan_project", "SELECT n_nationkey, n_name FROM nation")
def scan_project(spark: SparkSession, sf: str) -> DataFrame:
    """S3/P1 — full scan with column projection (reference nshmdb.py:606,620).
    ReadSchema in the parquet scan carries only the two columns."""
    return read_table(spark, sf, "nation").select("n_nationkey", "n_name")


@register(
    "point_lookup",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier WHERE s_suppkey = 5",
)
def point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """P2 — natural-key equality lookup (reference nshmdb.py:385-390).
    The predicate reaches the scan as a PushedFilter."""
    return read_table(spark, sf, "supplier").filter(F.col("s_suppkey") == 5)


@register(
    "range_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity
       FROM lineitem
       WHERE l_quantity >= 10.0 AND l_quantity <= 20.0
         AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'""",
)
def range_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P3/P4 — range predicates (reference query.py:297-311); bounds are
    inclusive on both ends like the reference's >= / <=."""
    li = read_table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 10.0)
        & (F.col("l_quantity") <= 20.0)
        & (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_dim_hierarchy",
    """SELECT n_nationkey, n_name, r_name
       FROM nation JOIN region ON n_regionkey = r_regionkey""",
)
def join_dim_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    """J2 — 2-level dimension hierarchy join (fault ⋈ parent_fault,
    reference nshmdb.py:437-444). Broadcast: region is tiny everywhere."""
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@register(
    "join_5way_agg",
    """SELECT r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              COUNT(*) AS n_items
       FROM region
       JOIN nation   ON n_regionkey = r_regionkey
       JOIN customer ON c_nationkey = n_nationkey
       JOIN orders   ON o_custkey = c_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       GROUP BY r_name""",
)
def join_5way_agg(spark: SparkSession, sf: str) -> DataFrame:
    """J6 — 5-way star join + grouped SUM (reference rate summation,
    nshmdb.py:222-234). Dim side broadcast end-to-end; the only shuffle is
    the final groupBy on r_name (5 groups, map-side combined)."""
    region = F.broadcast(read_table(spark, sf, "region"))
    nation = F.broadcast(read_table(spark, sf, "nation"))
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_BJ_BITS = 1 << 17  # constant-size bit sets, broadcastable at any scale
_BJ_H1 = (48_271, 7)
_BJ_H2 = (16_807, 13)


def _bj_bit(x: str, ab: tuple[int, int]) -> str:
    return f"((({x}) * {ab[0]} + {ab[1]}) % 1000000007) % {_BJ_BITS}"


def bloom_prefilter(
    fact: DataFrame, fact_key: str, keys: DataFrame, keys_key: str
) -> DataFrame:
    """Semi-join reduction: drop fact rows whose join key cannot be in
    ``keys`` using two constant-size (2^17-bit) hash sets — the runtime
    filter a 100 TB join plans when the build side is too big to
    broadcast as ROWS but its bit summary is not. May pass false
    positives (the exact join removes them); never drops a true match,
    so result equality with the plain join holds by construction."""
    b1 = F.broadcast(
        keys.select(F.expr(_bj_bit(keys_key, _BJ_H1)).alias("h1")).distinct()
    )
    b2 = F.broadcast(
        keys.select(F.expr(_bj_bit(keys_key, _BJ_H2)).alias("h2")).distinct()
    )
    return (
        fact.withColumn("_h1", F.expr(_bj_bit(fact_key, _BJ_H1)))
        .withColumn("_h2", F.expr(_bj_bit(fact_key, _BJ_H2)))
        .join(b1, F.col("_h1") == F.col("h1"))
        .join(b2, F.col("_h2") == F.col("h2"))
        .drop("_h1", "_h2", "h1", "h2")
    )


@register(
    "bloom_join_prefilter",
    """SELECT l_returnflag,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              COUNT(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderpriority = '1-URGENT'
       GROUP BY l_returnflag""",
)
def bloom_join_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Selective fact⋈dim join with an explicit Bloom semi-join
    reduction: the urgent-order key set is summarized into two
    broadcastable 2^17-bit hash sets and the lineitem scan is
    prefiltered BEFORE the key shuffle — at 100 TB the dim's rows don't
    broadcast but its bit summary always does, so the exchange moves
    only ~selectivity of the fact instead of all of it. The exact join
    then removes the bloom's false positives, so the answer provably
    equals the plain join (the oracle runs exactly that). Spark's own
    AQE runtime filters do this opportunistically; this operator is the
    deterministic, always-on form."""
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    lean = bloom_prefilter(
        lineitem.select(
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
        urgent,
        "o_orderkey",
    )
    return (
        lean.join(urgent, lean.l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "left_join_count",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       GROUP BY c_custkey""",
)
def left_join_count(spark: SparkSession, sf: str) -> DataFrame:
    """J8 — left outer join (natural→surrogate map resolution shape,
    reference nshmdb.py:313-334); COUNT skips the NULLs of unmatched rows."""
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "semi_join_membership",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem JOIN part ON l_partkey = p_partkey
                     WHERE l_orderkey = o_orderkey AND p_brand = 'Brand#1')""",
)
def semi_join_membership(spark: SparkSession, sf: str) -> DataFrame:
    """J12 — membership as a semi-join (the reference expresses it as a
    conditional-count HAVING, query.py:273; left_semi is the direct form)."""
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    part = F.broadcast(read_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#1"))
    members = li.join(part, li.l_partkey == part.p_partkey).select("l_orderkey")
    return orders.join(
        members, orders.o_orderkey == members.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "anti_join_missing",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def anti_join_missing(spark: SparkSession, sf: str) -> DataFrame:
    """J13 — INSERT-OR-IGNORE upsert shape as a left-anti join (reference
    nshmdb.py:263-266): rows whose key is absent on the other side."""
    customer = read_table(spark, sf, "customer").select(
        F.col("c_custkey"), F.col("c_name")
    )
    orders = read_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return upsert_missing(customer, orders, ["c_custkey"])


@register(
    "asof_nearest_ge",
    """WITH targets AS (SELECT CAST(target AS DOUBLE) AS target
                        FROM (VALUES (1.0), (500.0), (903.0), (1200.0), (99999.0)) AS v(target)),
            d AS (SELECT DISTINCT p_retailprice AS v FROM part),
            ge AS (SELECT target, MIN(v) AS ge_v FROM d JOIN targets ON v >= target GROUP BY target)
       SELECT t.target, COALESCE(ge.ge_v, (SELECT MAX(v) FROM d)) AS rounded
       FROM targets t LEFT JOIN ge ON t.target = ge.target""",
)
def asof_nearest_ge(spark: SparkSession, sf: str) -> DataFrame:
    """J11 — nearest-≥ value match with clamp-to-max (reference
    np.searchsorted rounding, nshmdb.py:215-221) as a range join + min-agg;
    the domain is never collected to the driver."""
    part = read_table(spark, sf, "part")
    targets = spark.createDataFrame(
        [(1.0,), (500.0,), (903.0,), (1200.0,), (99999.0,)], "target double"
    )
    return nearest_ge_lookup(part, "p_retailprice", targets, "target")


@register(
    "asof_nearest_ge_per_key",
    """WITH targets AS (SELECT p_brand, CAST(target AS DOUBLE) AS target
                        FROM (VALUES ('Brand#1', 910.0), ('Brand#1', 99999.0),
                                     ('Brand#2', 905.0), ('Brand#3', 1.0)) AS v(p_brand, target)),
            d AS (SELECT DISTINCT p_brand, p_retailprice AS v FROM part),
            ge AS (SELECT d.p_brand, t.target, MIN(v) AS ge_v
                   FROM d JOIN targets t ON d.p_brand = t.p_brand AND d.v >= t.target
                   GROUP BY d.p_brand, t.target),
            mx AS (SELECT p_brand, MAX(v) AS max_v FROM d GROUP BY p_brand)
       SELECT t.p_brand, t.target, COALESCE(ge.ge_v, mx.max_v) AS rounded
       FROM targets t
       LEFT JOIN ge ON t.p_brand = ge.p_brand AND t.target = ge.target
       LEFT JOIN mx ON t.p_brand = mx.p_brand""",
)
def asof_nearest_ge_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """J11 per-key variant — the most_likely_fault shape (nshmdb.py:204-234):
    window row_number()==1 per (key, target), clamped to the key max."""
    part = read_table(spark, sf, "part")
    targets = spark.createDataFrame(
        [("Brand#1", 910.0), ("Brand#1", 99999.0), ("Brand#2", 905.0), ("Brand#3", 1.0)],
        "p_brand string, target double",
    )
    return nearest_ge_lookup_per_key(
        part, "p_brand", "p_retailprice", targets, "p_brand", "target"
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "groupby_agg",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(AVG(l_quantity), 4) AS avg_qty,
              ROUND(AVG(l_discount), 6) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def groupby_agg(spark: SparkSession, sf: str) -> DataFrame:
    """A1 — hash aggregate with multiple measures (TPC-H Q1 shape; reference
    rate summation nshmdb.py:223-234). Partial agg map-side, 4 groups."""
    li = read_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "conditional_agg_membership",
    """WITH memb AS (
           SELECT l_orderkey,
                  BOOL_OR(p_brand = 'Brand#1') AS has_b1,
                  BOOL_OR(p_brand = 'Brand#2') AS has_b2
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY l_orderkey)
       SELECT o_orderpriority,
              COUNT(CASE WHEN has_b1 AND NOT has_b2 THEN 1 END) AS n_b1_not_b2,
              COUNT(*) AS n_orders
       FROM orders JOIN memb ON o_orderkey = l_orderkey
       GROUP BY o_orderpriority""",
)
def conditional_agg_membership(spark: SparkSession, sf: str) -> DataFrame:
    """A2 — per-group membership flags via bool_or (the reference's
    SUM(CASE WHEN name=? THEN 1 ELSE 0 END) > 0, query.py:273)."""
    li = read_table(spark, sf, "lineitem")
    part = F.broadcast(read_table(spark, sf, "part"))
    orders = read_table(spark, sf, "orders")
    memb = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.bool_or(F.col("p_brand") == "Brand#1").alias("has_b1"),
            F.bool_or(F.col("p_brand") == "Brand#2").alias("has_b2"),
        )
    )
    return (
        orders.join(memb, orders.o_orderkey == memb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("has_b1") & ~F.col("has_b2"), 1)).alias("n_b1_not_b2"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "count_distinct",
    """SELECT n_name, COUNT(DISTINCT c_custkey) AS n_customers
       FROM nation JOIN customer ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A3 — COUNT(DISTINCT) per group (reference fault-count cap,
    query.py:313-315). Spark expands to a two-phase distinct aggregate."""
    nation = F.broadcast(read_table(spark, sf, "nation"))
    customer = read_table(spark, sf, "customer")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("n_customers"))
    )


@register(
    "any_value_carry",
    """SELECT l_orderkey, ANY_VALUE(o_orderpriority) AS priority,
              ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY l_orderkey""",
)
def any_value_carry(spark: SparkSession, sf: str) -> DataFrame:
    """A4 — ANY_VALUE to carry functionally-dependent attributes through a
    GROUP BY (reference query.py:319). Deterministic here because the
    carried column is constant within each group."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.any_value(F.col("o_orderpriority")).alias("priority"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "having_postagg",
    """SELECT l_partkey, ROUND(SUM(l_quantity), 2) AS total_qty
       FROM lineitem GROUP BY l_partkey HAVING SUM(l_quantity) > 500""",
)
def having_postagg(spark: SparkSession, sf: str) -> DataFrame:
    """A5 — HAVING = post-aggregation filter (reference query.py:329)."""
    li = read_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.sum("l_quantity").alias("__raw"),
        )
        .filter(F.col("__raw") > 500)
        .select("l_partkey", "total_qty")
    )


@register("distinct_ordered", "SELECT DISTINCT p_type FROM part ORDER BY p_type")
def distinct_ordered(spark: SparkSession, sf: str) -> DataFrame:
    """A6/O1 — SELECT DISTINCT + ORDER BY (reference distinct magnitudes,
    nshmdb.py:206-211)."""
    return read_table(spark, sf, "part").select("p_type").distinct().orderBy("p_type")


@register(
    "scalar_max",
    "SELECT MAX(o_orderkey) AS max_key, COUNT(*) AS n FROM orders",
)
def scalar_max(spark: SparkSession, sf: str) -> DataFrame:
    """A8 — scalar MAX for surrogate-key generation (nshmdb.py:270-272)."""
    return read_table(spark, sf, "orders").agg(
        F.max("o_orderkey").alias("max_key"), F.count(F.lit(1)).alias("n")
    )


@register(
    "weighted_branch_merge",
    """SELECT l_partkey,
              ROUND(SUM(CASE l_returnflag WHEN 'A' THEN 0.5 WHEN 'N' THEN 0.3 ELSE 0.2 END
                        * l_extendedprice), 3) AS rate
       FROM lineitem GROUP BY l_partkey""",
)
def weighted_merge_q(spark: SparkSession, sf: str) -> DataFrame:
    """A7 — weighted logic-tree branch merge (reference api.py:494-515) as
    union-all + one hash aggregate; each return-flag slice plays a branch."""
    li = read_table(spark, sf, "lineitem")
    branches = [
        (w, li.filter(F.col("l_returnflag") == flag).select(
            "l_partkey", F.col("l_extendedprice").alias("rate")))
        for flag, w in (("A", 0.5), ("N", 0.3), ("R", 0.2))
    ]
    # ROUND at 3, not 2: weight×price values are exact multiples of 0.001,
    # so 2-decimal boundaries (k·0.005) coincide with true sums and the two
    # engines break the tie differently; at 3 decimals the nearest boundary
    # is 5e-4 away — far beyond fp drift.
    merged = weighted_branch_merge(branches, ["l_partkey"], "rate")
    return merged.select("l_partkey", F.round(F.col("rate"), 3).alias("rate"))


@register(
    "rollup_agg",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-reference: ROLLUP grouping sets (SURVEY §2.4 'absent' row) —
    free in Spark, included for coverage."""
    return (
        read_table(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "approx_count_distinct",
    """SELECT n_name, COUNT(DISTINCT c_custkey) AS exact_n, true AS within_5pct
       FROM nation JOIN customer ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-reference scale path: HyperLogLog++ distinct counting — the
    sketch that replaces exact COUNT(DISTINCT)'s Expand+double-shuffle at
    100 TB (constant memory per group, one pass). The sketch itself can't
    hash-match another engine, so the CONTRACT is oracled instead: the
    query emits whether Spark's approx landed within 5% of exact (rsd is
    2.5%); the oracle asserts `true` with the exact count alongside — any
    bound violation hash-mismatches."""
    nation = F.broadcast(read_table(spark, sf, "nation"))
    customer = read_table(spark, sf, "customer")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("exact_n"),
            F.approx_count_distinct("c_custkey", 0.01).alias("__approx"),
        )
        .select(
            "n_name",
            "exact_n",
            (
                F.abs(F.col("__approx") - F.col("exact_n"))
                <= 0.05 * F.col("exact_n")
            ).alias("within_5pct"),
        )
    )


@register(
    "approx_count_distinct_sketch",
    """SELECT n_name, true AS within_5pct
       FROM nation JOIN customer ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def approx_count_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """The HLL sketch's error CONTRACT as a hash-comparable row (VERDICT
    r03 "What's wrong" #1): the sketch estimate itself is engine-specific
    and can never hash-match DuckDB, so what both engines emit is the
    boolean `|sketch − exact|/exact ≤ 0.05` per group — Spark evaluates
    it against its own exact count, the oracle asserts `true` outright;
    any bound violation hash-mismatches. Differs from
    `approx_count_distinct` (which also reports exact_n for inspection)
    by emitting ONLY the contract column — the minimal hash surface for
    the sketch-only operator. The pure one-pass sketch cost at 100 TB is
    the `__approx` aggregate alone; the exact count here is the test
    harness pinning the bound, not part of the production plan."""
    nation = F.broadcast(read_table(spark, sf, "nation"))
    customer = read_table(spark, sf, "customer")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("__exact"),
            F.approx_count_distinct("c_custkey", 0.01).alias("__approx"),
        )
        .select(
            "n_name",
            (
                F.abs(F.col("__approx") - F.col("__exact"))
                <= 0.05 * F.col("__exact")
            ).alias("within_5pct"),
        )
    )


@register(
    "cube_agg",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
              COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-reference: CUBE over (returnflag, linestatus) with the
    grouping-id bitmask disambiguating aggregated-away NULLs from data
    NULLs — one shuffle, all 4 grouping sets in a single pass."""
    return (
        read_table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "grouping_sets_agg",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
              COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                               (l_linestatus), ())""",
)
def grouping_sets_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-reference: explicit GROUPING SETS — the general form behind
    rollup/cube, picking exactly the aggregation levels a report needs
    (here: pair, linestatus-only, grand total) in one Expand + one
    shuffle rather than three scans unioned."""
    return (
        read_table(spark, sf, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


# ---------------------------------------------------------------------------
# §2.5 windows / §2.6 sort & top-k
# ---------------------------------------------------------------------------


@register(
    "topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC NULLS LAST, o_orderkey LIMIT 100""",
)
def topk_global(spark: SparkSession, sf: str) -> DataFrame:
    """O3 — top-k by measure (reference ORDER BY rate DESC NULLS LAST
    LIMIT, query.py:330-332). Plans as TakeOrderedAndProject: no global
    sort. Deterministic tie-break on the key."""
    orders = read_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return top_k(
        orders, [F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()], 100
    )


@register(
    "topk_per_group",
    """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
)
def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """§2.5 — per-group top-k via row_number window (the idiomatic scale-out
    generalization; the reference has no windows, SURVEY §2.5)."""
    orders = read_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    """SELECT o_custkey, o_orderkey,
              ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
       FROM orders""",
)
def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """§2.5 — running aggregate with an explicit ROWS frame."""
    orders = read_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_range_frame",
    """SELECT event_id, user_id,
              COUNT(*) OVER w AS n_1h,
              ROUND(SUM(value) OVER w, 2) AS sum_1h
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """§2.5 — RANGE (value-based) window frame: per user, count/sum of
    activity in the trailing hour of EVENT TIME, not the trailing N rows.
    Ordered on epoch microseconds so the frame bound is exact integer
    arithmetic on both engines (RANGE peers = identical order values)."""
    ev = read_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


@register(
    "percentile_agg",
    """SELECT l_returnflag,
              ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
              ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
              ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95
       FROM lineitem GROUP BY l_returnflag""",
)
def percentile_agg(spark: SparkSession, sf: str) -> DataFrame:
    """§2.4 'absent' row — exact linear-interpolated percentiles (the
    distribution profile a data-curation pipeline reports per shard).
    Spark's `percentile` and DuckDB's `quantile_cont` share the
    interpolation definition, so the values hash-match after rounding.
    At 100 TB swap in approx_percentile (t-digest sketch, one pass,
    mergeable) — same query shape."""
    li = read_table(spark, sf, "lineitem")
    pct = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.95D))")
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p25"),
            F.round(F.col("ps")[1], 4).alias("p50"),
            F.round(F.col("ps")[2], 4).alias("p75"),
            F.round(F.col("ps")[3], 4).alias("p95"),
        )
    )


@register(
    "approx_percentile_bound",
    """SELECT l_returnflag, COUNT(*) AS n, true AS p50_rank_ok
       FROM lineitem GROUP BY l_returnflag""",
)
def approx_percentile_bound(spark: SparkSession, sf: str) -> DataFrame:
    """The sketch path for percentile_agg: approx_percentile
    (Greenwald-Khanna, mergeable, one pass) with its rank-error CONTRACT
    oracled, the same pattern as approx_count_distinct's HLL bound. The
    sketch's guarantee — the returned value sits within ±n/accuracy ranks
    of the target — is checked honestly under ties: count(x < ap) must
    not exceed the upper target rank and count(x <= ap) must reach the
    lower one. The oracle asserts `true`; any violation hash-mismatches."""
    acc = 1000
    li = read_table(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("l_quantity", 0.5, acc).alias("ap"),
    )
    ranked = (
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.count(F.when(F.col("l_quantity") < F.col("ap"), 1)).alias("n_lt"),
            F.count(F.when(F.col("l_quantity") <= F.col("ap"), 1)).alias("n_le"),
        )
    )
    eps = F.col("n") / acc + 1
    target = 0.5 * F.col("n")
    return ranked.select(
        "l_returnflag",
        "n",
        ((F.col("n_lt") <= target + eps) & (F.col("n_le") >= target - eps)).alias(
            "p50_rank_ok"
        ),
    )


@register(
    "surrogate_keys_dense",
    """SELECT p_brand, ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_id
       FROM (SELECT DISTINCT p_brand FROM part)""",
)
def surrogate_keys_dense(spark: SparkSession, sf: str) -> DataFrame:
    """A8 — dense surrogate keys via row_number over the distinct natural
    key (replaces the reference's MAX(id)+1+enumerate, nshmdb.py:270-272)."""
    brands = read_table(spark, sf, "part").select("p_brand").distinct()
    return dense_surrogate_keys(brands, ["p_brand"], "brand_id")


# ---------------------------------------------------------------------------
# §2.7 set operations & reshaping
# ---------------------------------------------------------------------------


@register(
    "union_all_stack",
    """SELECT src, ROUND(SUM(bal), 2) AS total_bal, COUNT(*) AS n
       FROM (SELECT c_acctbal AS bal, 'customer' AS src FROM customer
             UNION ALL
             SELECT s_acctbal AS bal, 'supplier' AS src FROM supplier)
       GROUP BY src""",
)
def union_all_stack(spark: SparkSession, sf: str) -> DataFrame:
    """U1 — union-all stacking of per-source frames (reference pd.concat of
    fault-system solutions, api.py:547-562) + aggregate."""
    cust = read_table(spark, sf, "customer").select(
        F.col("c_acctbal").alias("bal"), F.lit("customer").alias("src")
    )
    supp = read_table(spark, sf, "supplier").select(
        F.col("s_acctbal").alias("bal"), F.lit("supplier").alias("src")
    )
    return (
        cust.unionByName(supp)
        .groupBy("src")
        .agg(F.round(F.sum("bal"), 2).alias("total_bal"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "unpivot_long",
    """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
       UNION ALL
       SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part""",
)
def unpivot_long(spark: SparkSession, sf: str) -> DataFrame:
    """U2 — wide→long unpivot (reference MFD melt, api.py:316-319) via
    Spark's native unpivot; no shuffle, one projection per row."""
    part = read_table(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    )
    return unpivot_wide(part, ["p_partkey"], ["p_size", "p_retailprice"], "measure", "value")


@register(
    "explode_tokens",
    """SELECT doc_id, token FROM (
           SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS token FROM documents)
       WHERE token <> ''""",
)
def explode_tokens_q(spark: SparkSession, sf: str) -> DataFrame:
    """U3 — explode of a split column (the reference's np.repeat ragged
    expansion, api.py:388-397); explode pipelines inside the scan stage."""
    return explode_tokens(read_table(spark, sf, "documents"), "doc_id", "text")


@register(
    "ragged_csv_roundtrip",
    "SELECT l_orderkey AS rupture_id, l_partkey AS fault_id FROM lineitem",
)
def ragged_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S7 — ragged-CSV parser (`rupture, n, fault_1..fault_n`, reference
    api.py:362-398): the ragged lines are landed ONCE per sf as a text
    file (the reference parses files too — indices.csv out of a zip), then
    the registered query is the real shape: text scan → split/slice/
    explode, all codegen'd. Result must equal the raw (orderkey, partkey)
    pairs — round-trip identity."""
    import os

    from nshm2022db_spark.sources.scratch import is_landed, mark_landed, scratch_path

    base = scratch_path("ragged_csv", sf)
    path = os.path.join(base, "indices")
    if not is_landed(base):
        li = read_table(spark, sf, "lineitem")
        (
            li.groupBy("l_orderkey")
            .agg(F.collect_list(F.col("l_partkey")).alias("fs"))
            .select(
                F.concat_ws(
                    ",",
                    F.col("l_orderkey").cast("string"),
                    F.size("fs").cast("string"),
                    F.concat_ws(",", F.col("fs").cast("array<string>")),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(path)
        )
        mark_landed(base)
    return parse_ragged_indices(spark.read.text(path))


@register(
    "csv_scan_join",
    """SELECT o_orderkey AS nshm_id,
              ROUND(o_totalprice / 1000, 6) AS magnitude,
              CAST(o_custkey AS DOUBLE) AS area,
              CAST(o_orderkey % 97 AS DOUBLE) AS len,
              ROUND(o_totalprice / 1e6, 8) AS rate,
              3 AS fault_system
       FROM orders""",
)
def csv_scan_join(spark: SparkSession, sf: str) -> DataFrame:
    """S6+J9+U4 — header-CSV scans of rupture rates + properties with
    explicit schemas, joined on `Rupture Index` and renamed (reference
    api.py:323-356). The two CSVs are landed once per sf from orders with
    deterministic formulas; the oracle recomputes them from orders
    directly, so the compare verifies the CSV round trip + join."""
    import os

    from nshm2022db_spark.etl.ingest import read_rupture_csvs
    from nshm2022db_spark.sources.scratch import is_landed, mark_landed, scratch_path

    base = scratch_path("rupture_csvs", sf)
    rates_p, props_p = os.path.join(base, "rates"), os.path.join(base, "props")
    if not is_landed(base):
        orders = read_table(spark, sf, "orders")
        (
            orders.select(
                F.col("o_orderkey").alias("Rupture Index"),
                F.round(F.col("o_totalprice") / 1e6, 8).alias("Annual Rate"),
            ).write.mode("overwrite").csv(rates_p, header=True)
        )
        (
            orders.select(
                F.col("o_orderkey").alias("Rupture Index"),
                F.round(F.col("o_totalprice") / 1000, 6).alias("Magnitude"),
                F.col("o_custkey").cast("double").alias("Area (m^2)"),
                (F.col("o_orderkey") % 97).cast("double").alias("Length (m)"),
            ).write.mode("overwrite").csv(props_p, header=True)
        )
        mark_landed(base)  # both dirs written — landing is complete
    return read_rupture_csvs(spark, rates_p, props_p, fault_system=3)


@register(
    "intersect_types",
    """SELECT p_type FROM part WHERE p_brand = 'Brand#1'
       INTERSECT
       SELECT p_type FROM part WHERE p_brand = 'Brand#2'""",
)
def intersect_types(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 'absent' row — INTERSECT, built-in in Spark."""
    part = read_table(spark, sf, "part")
    a = part.filter(F.col("p_brand") == "Brand#1").select("p_type")
    b = part.filter(F.col("p_brand") == "Brand#2").select("p_type")
    return a.intersect(b)


@register(
    "except_types",
    """SELECT p_type FROM part WHERE p_brand = 'Brand#1'
       EXCEPT
       SELECT p_type FROM part WHERE p_brand = 'Brand#2'""",
)
def except_types(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 'absent' row — EXCEPT (distinct semantics = Spark subtract)."""
    part = read_table(spark, sf, "part")
    a = part.filter(F.col("p_brand") == "Brand#1").select("p_type")
    b = part.filter(F.col("p_brand") == "Brand#2").select("p_type")
    return a.subtract(b)


@register(
    "pivot_wide",
    """SELECT l_returnflag,
              ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS "O",
              ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS "F"
       FROM lineitem GROUP BY l_returnflag""",
)
def pivot_wide(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 'absent' row — pivot (long→wide), built-in in Spark."""
    return (
        read_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ---------------------------------------------------------------------------
# §2.8 scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_string_format",
    """SELECT p_partkey, p_brand || ': Section ' || CAST(p_size AS VARCHAR) AS label
       FROM part""",
)
def scalar_string_format(spark: SparkSession, sf: str) -> DataFrame:
    """F7 — section-label string formatting (reference nshmdb.py:559-563)."""
    return read_table(spark, sf, "part").select(
        "p_partkey",
        F.concat(
            F.col("p_brand"), F.lit(": Section "), F.col("p_size").cast("string")
        ).alias("label"),
    )


@register(
    "json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
       FROM events""",
)
def json_extract_q(spark: SparkSession, sf: str) -> DataFrame:
    """§2.8 'absent' row — JSON path extraction over the events props."""
    return read_table(spark, sf, "events").select(
        "event_id", F.get_json_object(F.col("props"), "$.k").cast("int").alias("k")
    )


@register(
    "events_tumbling_window",
    """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
              COUNT(*) AS n, ROUND(SUM(value), 2) AS total
       FROM events GROUP BY 1, 2""",
)
def events_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregate (SURVEY §2.10;
    the streaming variant lives in streaming/): F.window 1-hour buckets
    align with DATE_TRUNC('hour') since epoch is hour-aligned."""
    ev = read_table(spark, sf, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


_PROFILE_COLS = ["o_custkey", "o_totalprice"]


@register(
    "table_profile",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n,
                  COUNT(*) - COUNT({c}) AS n_null,
                  COUNT(DISTINCT {c}) AS n_distinct,
                  ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS min_v,
                  ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS max_v,
                  ROUND(CAST(AVG({c}) AS DOUBLE), 4) AS avg_v
           FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Data profiling: per-column count/nulls/distinct/min/max/mean in ONE
    pass over the table — all columns' aggregates compute in a single
    scan + single reduce, then unpivot to one row per column. The
    first thing a training-data pipeline runs against a new 100 TB drop;
    a per-column loop would be N scans."""
    orders = read_table(spark, sf, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min, {c}__max, {c}__avg"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n, n_null, n_distinct, min_v, max_v, avg_v)"
        )
    )


@register(
    "events_funnel",
    """WITH firsts AS (
           SELECT user_id,
                  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
                  MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                      AS any_purchase_ts
           FROM events GROUP BY user_id),
        conv AS (
           SELECT f.user_id, f.signup_ts,
                  MIN(e.ts) AS converted_ts
           FROM firsts f
           LEFT JOIN events e
             ON e.user_id = f.user_id AND e.event_type = 'purchase'
            AND e.ts >= f.signup_ts
           WHERE f.signup_ts IS NOT NULL
           GROUP BY f.user_id, f.signup_ts)
       SELECT user_id, signup_ts, converted_ts,
              converted_ts IS NOT NULL AS converted,
              ROUND((epoch_us(converted_ts) - epoch_us(signup_ts))
                    / 3600000000.0, 4) AS hours_to_convert
       FROM conv""",
)
def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential funnel: per signed-up user, the first purchase AT or
    after their first signup, conversion flag, and hours-to-convert.
    One conditional aggregate pass for the anchor event + one range-
    predicate aggregation for the conversion — the standard two-step
    funnel shape, all map-side-combinable."""
    ev = read_table(spark, sf, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "signup_ts"
            )
        )
        .filter(F.col("signup_ts").isNotNull())
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(
            purchases,
            (firsts.user_id == purchases.user_id)
            & (F.col("p_ts") >= F.col("signup_ts")),
            "left",
        )
        .drop(purchases.user_id)
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("converted_ts"))
    )
    return conv.select(
        "user_id",
        "signup_ts",
        "converted_ts",
        F.col("converted_ts").isNotNull().alias("converted"),
        F.round(
            # Integer micros difference, then ONE double division — the
            # identical int→double→divide sequence the oracle runs, so
            # the rounded value is bit-exact across engines.
            (epoch_us("converted_ts") - epoch_us("signup_ts")) / 3_600_000_000.0,
            4,
        ).alias("hours_to_convert"),
    )


@register(
    "hll_shard_merge",
    """WITH exact AS (SELECT COUNT(DISTINCT user_id) AS exact_n FROM events)
       SELECT exact_n, TRUE AS within_5pct FROM exact""",
)
def hll_shard_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-sketch rollup — the pattern that makes 100 TB distinct
    counting incremental: each shard (event_type stands in for a file
    shard or a day partition) builds its OWN HLL sketch buffer
    (hll_sketch_agg), and the global answer is the UNION of the stored
    sketch buffers (hll_union_agg) — raw data is never re-scanned to
    re-count a larger scope. This is how per-day sketches roll into
    month/quarter cardinalities, and why sketch columns belong IN the
    rollup tables the incremental sink maintains. The sketch binary is
    engine-specific, so (as with approx_count_distinct) the ORACLE pins
    the contract: the merged estimate must land within 5% of the exact
    distinct count, emitted as a boolean the hash compare verifies."""
    ev = read_table(spark, sf, "events")
    shard_sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch")
    )
    merged = shard_sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_n"))
    return exact.join(merged).select(
        "exact_n",
        (
            F.abs(F.col("est") - F.col("exact_n")) <= 0.05 * F.col("exact_n")
        ).alias("within_5pct"),
    )


@register(
    "salted_skew_join",
    """SELECT o_orderpriority,
              COUNT(*) AS n,
              ROUND(SUM(o_totalprice), 2) AS total
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY o_orderpriority""",
)
def salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """The salted-shuffle join (operators/skew.py) on the driver-verified
    surface: orders ⋈ customer through `salted_join` with 8 salts — the
    fact side scatters each row across sub-keys, the dimension side
    replicates, and a hot customer's orders land on 8 reducers instead
    of one. The oracle is the PLAIN join: salting must be a pure
    physical-layout change with zero semantic effect, and the value-hash
    compare proves exactly that. At sf0.1 the salt is overhead (AQE would
    handle this shape); it is registered because correctness-under-
    salting is the property worth a standing driver check — the 100 TB
    failure mode is a salted refactor that silently duplicates or drops
    rows on an outer side (the operator rejects right-preserving joins
    for that reason, pinned by test_scale_ops)."""
    from nshm2022db_spark.operators.skew import salted_join

    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    joined = salted_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.withColumnRenamed("c_custkey", "custkey"),
        on=["custkey"],
        n_salts=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "sql_api_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(AVG(l_discount), 6) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def sql_api_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL front door: the same engine surface through
    ``spark.sql`` over registered temp views instead of the DataFrame
    API — proving a user can point existing ANSI SQL (here the TPC-H Q1
    pricing-summary shape) at this engine's read layer unchanged.
    Catalyst compiles both fronts to the same logical plan, so every
    pushdown/pruning/plan property the DataFrame queries pin holds here
    too; the view is created from read_table, so the normalized-schema
    contract (events ts etc.) applies to SQL users as well.

    AVG is engine-order-sensitive like SUM; ROUND(, 6) on both sides is
    inside the cross-engine drift headroom at this scale."""
    read_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  ROUND(SUM(l_quantity), 2) AS sum_qty,
                  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                  ROUND(AVG(l_discount), 6) AS avg_disc,
                  COUNT(*) AS count_order
           FROM lineitem_v
           WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
           GROUP BY l_returnflag, l_linestatus"""
    )
