"""Parquet read/write layer (reference: S1/S9, nshmdb.py:104-131,263-308).

The reference opens one SQLite file and re-attaches it to DuckDB for
analytics; here one engine serves both paths: Parquet scans with Catalyst
pushdown for analytics, the same scans + broadcast joins for point reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nshm2022db_spark.schemas import STAR_TABLES


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Runtime confs the events read depends on, set here so the read
    works in ANY session — not just ones built by our session factory
    (session.py sets them too, but the driver builds its own session):

    * nanosAsLong — nanos-layout events.parquet stores ts as INT64
      TIMESTAMP(NANOS), which Spark rejects outright without it;
    * session.timeZone=UTC — the canonical ts type below is
      TIMESTAMP_NTZ (wall clock == the file's UTC instants); pinning the
      session zone makes the LTZ<->NTZ casts used during normalization
      and epoch extraction exact regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def ts_type_of_file(path: str) -> str:
    """Sniff ONE parquet file's footer (driver-side, no data read) and
    report the physical ts layout: 'nanos' (INT64 TIMESTAMP(NANOS), the
    round-1 testdata) or 'micros' (timestamp[us], the current layout)."""
    import pyarrow.parquet as pq

    t = pq.read_schema(path).field("ts").type
    return "nanos" if getattr(t, "unit", None) == "ns" else "micros"


def events_ts_type(sf_dir: str) -> str:
    """The ts layout of the static events table. Streaming readers need
    this BEFORE building their explicit source schema (they sniff the
    actual streamed directory first, falling back to this — see
    streaming.events._dir_ts_type); the batch path below just inspects
    what Spark decoded."""
    return ts_type_of_file(f"{sf_dir}/events.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ts column to TIMESTAMP_NTZ whatever the file
    layout decoded to. NTZ is the canonical type: it collects as naive
    UTC wall-clock datetimes, exactly what the DuckDB oracle returns for
    a tz-less parquet timestamp. Case-insensitive lookup (Spark column
    resolution is), and a no-op when the column is absent."""
    ts = next((f for f in df.schema.fields if f.name.lower() == "ts"), None)
    if ts is None:
        return df
    if isinstance(ts.dataType, T.LongType):
        # Nanos layout + nanosAsLong: long nanoseconds. Integer `div` —
        # a double division would lose precision on ~1.7e18 ns epochs
        # (> 2^53). timestamp_micros yields LTZ; the NTZ cast is exact
        # under the UTC session zone pinned above.
        return df.withColumn(
            ts.name,
            F.expr(f"cast(timestamp_micros({ts.name} div 1000) as timestamp_ntz)"),
        )
    if isinstance(ts.dataType, T.TimestampType):
        return df.withColumn(ts.name, F.col(ts.name).cast("timestamp_ntz"))
    return df  # already TIMESTAMP_NTZ (micros layout default)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Schema comes from parquet footers (already
    explicit at write time); Catalyst prunes columns / pushes filters into
    the scan."""
    if name == "events":
        ensure_nanos_as_long(spark)
    # footer-derived schema skips the per-read schema-inference Spark
    # job (guide §1/§6); falls back to inference for any type outside
    # the proven-safe map (e.g. the events table's nanos timestamps)
    from nshm2022db_spark.streaming.sinks import _read_parquet_fast

    df = _read_parquet_fast(spark, f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Spread a compute-heavy scan across the executors. The sf testdata
    tables are each ONE parquet file with ONE row group, so Spark cannot
    split the scan and every map-side projection chain runs on a single
    core — measured r14 (PERF.md): the 32-core wall of the gram-explode
    text pipelines equaled their single-thread projection, exactly the
    pathology the codec lane hit (multimodal._spread). At 100 TB the
    source's own file count provides the spread for free — the explicit
    round-robin repartition is the testdata stand-in, not an extra
    production shuffle. Apply it ONLY where the measured map-side work
    dominates the one extra pass over the pruned input columns (the r14
    probe: winnow/novelty/dsir/substring-runs/repetition win 1.5-2.5x;
    bpe_encode_learned and the ADC scans LOSE — their hot work already
    sits post-exchange, so the spread is pure added shuffle)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All ten testdata tables as DataFrames keyed by name."""
    return {name: read_table(spark, sf_dir, name) for name in STAR_TABLES}


def write_table(df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None) -> None:
    """Bulk sink (reference: executemany/to_sql appends, nshmdb.py:263-308).

    At 100 TB scale pass partition_by (e.g. fault_system) so downstream
    queries get partition pruning.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Catalog-managed bucketed table: rows are hash-bucketed (and
    optionally sorted) on the join key AT WRITE TIME, so every later join
    or aggregation on that key is exchange-free — the shuffle is paid once
    per dataset instead of once per query. This is the co-located-join
    strategy for repeated fact⋈fact joins at 100 TB
    (tests/test_plans.py pins the no-Exchange plan)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction — the maintenance job every streaming or
    incremental-append table needs: N tiny files become
    ceil(input_bytes / target_bytes) right-sized files. Tiny files are
    the silent 100 TB killer (one scan task + one footer read each; a
    million 1 MB files is a million tasks). Input size comes from the
    driver-side file listing (no data read); the single repartition is
    round-robin, so output files are uniformly sized regardless of input
    skew. Returns the output file count. For partitioned layouts run
    per-partition so compaction parallelizes and commits independently."""
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return n_out
