"""Temporal warehouse operators over the events table: SCD2 dimension
build, timeline gap-fill, LOCF forward-fill, and rank distributions.

These extend the reference's relational surface (SURVEY §2.4/§2.5 window
family) with the history-tracking shapes a warehouse or feature-store
pipeline runs daily. All are pure column expressions over one or two
shuffles on `user_id` — no Python UDFs — and every window uses the total
order (ts, event_id), so results are deterministic and exactly
reproducible on the DuckDB oracle.

Float discipline: rank ratios are ROUND(x, 6) on both sides; everything
else is integer or timestamp arithmetic (engine-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nshm2022db_spark.functions.timecols import epoch_us_sql
from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table

HOUR_US = 3_600_000_000


@register(
    "scd2_build",
    """WITH ordered AS (
           SELECT user_id, event_id, ts, event_type,
                  LAG(event_type) OVER w AS prev_type
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        changes AS (
           SELECT user_id, event_id, ts, event_type FROM ordered
           WHERE prev_type IS NULL OR event_type <> prev_type)
       SELECT user_id, event_type, ts AS valid_from,
              LEAD(ts) OVER w AS valid_to,
              LEAD(ts) OVER w IS NULL AS is_current,
              CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
       FROM changes
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def scd2_build(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 slowly-changing dimension build: collapse each user's
    event_type sequence into validity intervals — a row per state CHANGE
    with [valid_from, valid_to) bounds, a version number, and an
    is_current flag (the open interval). This is the standard
    change-log → dimension-history derivation every warehouse load runs.

    Scale shape: both window passes and the change filter cluster on the
    SAME user_id shuffle key, so Catalyst reuses one exchange for the
    whole pipeline; the change filter drops consecutive duplicates
    BEFORE the second window, so the versioning pass runs on the (much
    smaller) change set. Keys are users — uniform, no skew."""
    ev = read_table(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_id", "ts", "event_type")
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.lead("ts").over(wv).isNull().alias("is_current"),
        F.row_number().over(wv).cast("long").alias("version"),
    )


@register(
    "timeline_gapfill",
    f"""WITH b AS (
           SELECT user_id, epoch_us(ts) // {HOUR_US} AS bucket, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
        span AS (
           SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
           FROM b GROUP BY user_id),
        hours AS (
           SELECT user_id, unnest(range(lo, hi + 1)) AS bucket FROM span)
       SELECT h.user_id,
              make_timestamp(h.bucket * {HOUR_US}) AS bucket_start,
              CAST(COALESCE(b.n, 0) AS BIGINT) AS n
       FROM hours h LEFT JOIN b USING (user_id, bucket)""",
)
def timeline_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Timeline densification: per user, the hourly activity count over
    the user's FULL active span INCLUDING empty hours — the gap-fill /
    calendar-spine step time-series feature pipelines need before
    rolling-window models (missing hours must exist as zeros).

    Scale shape: the hourly rollup is a partial-aggregated shuffle whose
    width is (user, active-hour) pairs, not raw events; the spine is
    generated per user from a 2-column span aggregate (sequence+explode —
    no driver-side calendar, no cross join against a generated table);
    the fill join is left on (user_id, bucket), all keys uniform. The
    spine explode is the only row-amplifying step and is bounded by span
    length — at 100 TB, partition by (user bucket-range shard) if a
    single user's span must split."""
    ev = read_table(spark, sf, "events")
    counts = (
        ev.select("user_id", F.expr(f"{epoch_us_sql('ts')} div {HOUR_US}").alias("bucket"))
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = counts.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    hours = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    return hours.join(counts, ["user_id", "bucket"], "left").select(
        "user_id",
        F.expr(f"cast(timestamp_micros(bucket * {HOUR_US}) as timestamp_ntz)").alias(
            "bucket_start"
        ),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )


@register(
    "events_locf",
    """SELECT event_id, user_id, ts, event_type,
              LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                         IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_purchase_value
       FROM events""",
)
def events_locf(spark: SparkSession, sf: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: every event
    carries the value of the same user's most recent purchase at or
    before it — the standard forward-fill that turns sparse observations
    into a dense feature column (sensor gaps, price marks, session
    attributes). One window pass on the user_id exchange; `last(...,
    ignorenulls)` over a running frame is the built-in LOCF idiom and
    stays in the JVM. `value` is carried verbatim (no arithmetic), so no
    float rounding is needed for the oracle match."""
    ev = read_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "rank_distribution",
    """SELECT o_orderkey, o_orderpriority,
              ROUND(PERCENT_RANK() OVER w, 6) AS pr,
              ROUND(CUME_DIST() OVER w, 6) AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice, o_orderkey)""",
)
def rank_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group value-distribution ranks: percent_rank and cume_dist of
    order price within its priority class — the normalized-score step
    quality-weighted sampling uses (rank-based scores are robust to
    outliers where z-scores are not). Both ranks are exact integer
    ratios ((rank-1)/(n-1), rank/n) computed identically by both
    engines; the order key tiebreak makes ranks fully deterministic.
    One window pass, one exchange on the partition key."""
    orders = read_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "value_drift_trend",
    f"""WITH pts AS (
           SELECT event_type,
                  epoch_us(ts) // {HOUR_US} AS bucket,
                  CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
           FROM events),
        rel AS (
           SELECT event_type,
                  bucket - MIN(bucket) OVER (PARTITION BY event_type) AS x,
                  cents AS y
           FROM pts),
        s AS (
           SELECT event_type,
                  COUNT(*) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx
           FROM rel GROUP BY event_type)
       SELECT event_type, n,
              ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_hour,
              ROUND((CAST(sy AS DOUBLE)
                     - CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    / CAST(n AS DOUBLE), 6) AS intercept_cents
       FROM s""",
)
def value_drift_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group drift detection: the OLS trend of event value over time
    (slope in cents/hour + intercept per event_type) — the monitoring
    primitive that catches data drift before a model does.

    Numeric design: Spark and DuckDB both have regr_slope, but a
    single-pass float regression sums in partition order and the two
    engines would disagree in the last bits. Here every accumulated
    quantity is an INTEGER — value quantized to cents, time to a small
    per-group hour index (min-subtracted via a window ON THE SAME
    event_type exchange the aggregate uses: one shuffle total) — so
    Σx, Σy, Σxy, Σx² are exact on both engines and the slope is ONE
    double division of identical integers. Deterministic to the last bit,
    any partitioning, any cluster. At 100 TB-scale spans, shard the hour
    index per (group, epoch-window) to keep Σxy inside int64 — same plan,
    composite key."""
    ev = read_table(spark, sf, "events")
    pts = ev.select(
        "event_type",
        F.expr(f"{epoch_us_sql('ts')} div {HOUR_US}").alias("bucket"),
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("y"),
    )
    w = Window.partitionBy("event_type")
    rel = pts.select(
        "event_type",
        (F.col("bucket") - F.min("bucket").over(w)).alias("x"),
        "y",
    )
    s = rel.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
    )


WEEK_US = 7 * 24 * HOUR_US


@register(
    "cohort_retention",
    f"""WITH firsts AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) // {WEEK_US} AS cohort_week
            FROM events GROUP BY user_id),
        activity AS (
            SELECT DISTINCT e.user_id,
                   f.cohort_week,
                   epoch_us(e.ts) // {WEEK_US} - f.cohort_week AS week_offset
            FROM events e JOIN firsts f USING (user_id))
        SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
               CAST(week_offset AS BIGINT) AS week_offset,
               COUNT(*) AS n_active
        FROM activity
        GROUP BY cohort_week, week_offset""",
)
def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, and
    for each cohort the count still active N weeks later — the
    engagement analysis every product warehouse recomputes daily, and
    (for training pipelines) the contributor-retention view of a data
    marketplace.

    Scale shape: the first-seen aggregate and the (user, cohort, offset)
    DISTINCT both cluster on user_id, so the first two stages share one
    exchange; the cohort join rides it too (same key), and only the
    final triangle rollup — (cohorts × offsets) cardinality, tiny —
    re-shuffles. Week arithmetic is integer epoch math, engine-exact."""
    ev = read_table(spark, sf, "events").select(
        "user_id",
        # integer `div`, NOT double-divide-then-cast: a double quotient
        # landing an ulp under an exact week boundary would truncate to
        # the previous week where the oracle's integer floor would not.
        F.expr(f"{epoch_us_sql('ts')} div {WEEK_US}").alias("week"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "anomaly_mad",
    """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS m
           FROM events GROUP BY event_type),
        dev AS (
           SELECT e.event_type, e.value, m.m,
                  abs(e.value - m.m) AS d
           FROM events e JOIN med m USING (event_type)),
        mad AS (
           SELECT event_type, quantile_cont(d, 0.5) AS md
           FROM dev GROUP BY event_type)
       SELECT d.event_type,
              COUNT(*) AS n,
              ROUND(any_value(d.m), 6) AS median_value,
              ROUND(any_value(mad.md), 6) AS mad,
              CAST(SUM(CASE WHEN ROUND(d.d, 9) > ROUND(3 * mad.md, 9)
                       THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM dev d JOIN mad USING (event_type)
       GROUP BY d.event_type""",
)
def anomaly_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Robust anomaly screen: per event_type, the count of values more
    than 3 median-absolute-deviations from the median — the outlier
    detector that survives the outliers it is hunting (a z-score's mean
    and stddev are themselves dragged by the anomalies; median and MAD
    are not). Standard data-quality gate before a training run consumes
    a feed.

    Cross-engine determinism: both engines share the linear-interpolated
    percentile definition (proven by percentile_agg), and on top of that
    BOTH SIDES of the outlier comparison round to 9 decimals before
    comparing — the repo's standard float discipline — so a value sitting
    exactly on the 3·MAD boundary cannot flip on a 1-ulp interpolation
    divergence (ADVICE r03). Two grouped percentile passes on the
    event_type exchange plus broadcast joins of the 5-row stats — at
    100 TB swap exact percentiles for approx_percentile (t-digest, one
    pass, mergeable), same shape."""
    ev = read_table(spark, sf, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("m")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(d, 0.5D)").alias("md"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("m"), 6).alias("median_value"),
            F.round(F.first("md"), 6).alias("mad"),
            F.sum(
                (F.round(F.col("d"), 9) > F.round(3 * F.col("md"), 9)).cast("long")
            ).alias("n_outliers"),
        )
    )
