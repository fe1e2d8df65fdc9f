"""Lakehouse-table walkthrough — the commit-log table format end to end.

Every mutation below publishes through ONE protocol (staged immutable
data dirs + manifest CAS into an append-only log): micro-batch appends,
data-skipping reads, sorted compaction, GDPR erasure, restore, and
retention. Without Delta/Iceberg in the container, this is the same
minimal model those formats implement (streaming/sinks.py).

Run: python examples/lakehouse_table.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from nshm2022db_spark.session import get_spark
from nshm2022db_spark.streaming.sinks import (
    append_partition_transaction,
    compact_partition_table,
    read_keyed_table,
    restore_table_version,
    table_history,
    vacuum_versions,
)


def main() -> None:
    spark = get_spark("lakehouse_demo", master="local[8]")
    table = tempfile.mkdtemp(prefix="events_table_")

    # --- 1. micro-batch appends (what a streaming foreachBatch does) ----
    # Each append is ONE commit: O(batch) cost, per-day event_id stats
    # recorded from the parquet footers, batch-id replay idempotence.
    # event ids are time-ordered, so each day holds a disjoint id range —
    # the alignment that makes column stats prune (same as real logs)
    for bid, lo in enumerate((0, 1000, 2000)):
        batch = spark.range(lo, lo + 1000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.concat(F.lit("2024-01-0"), (F.col("id") / 1000).cast("int") + 1).alias("day"),
        )
        append_partition_transaction(
            spark, table, "day", batch, stats_cols=["event_id"], batch_id=bid
        )
    print("history:", [(m["version"], sorted(m["batch_ids"])) for m in table_history(table)])

    # --- 2. data-skipping read ------------------------------------------
    # The manifest's per-partition min/max answer "which partitions can
    # hold event_id 1200-1300" from JSON before any file opens.
    pruned = read_keyed_table(spark, table, prune={"event_id": (1200, 1300)})
    hit = pruned.filter(F.col("event_id").between(1200, 1300))
    print("skip-scan rows:", hit.count(), "from", len(pruned.inputFiles()), "files")

    # --- 3. sorted compaction (OPTIMIZE ... ZORDER) ---------------------
    compacted = compact_partition_table(
        spark, table, max_files_per_partition=2, sort_within=["event_id"]
    )
    print("compacted:", compacted, "-> version", table_history(table)[-1]["version"])

    # --- 4. erasure-style partial rewrite -------------------------------
    # Rewrite ONE day dropping a user's rows; other days' files untouched.
    from nshm2022db_spark.streaming.sinks import committed_partition_transaction

    committed_partition_transaction(
        spark,
        table,
        "day",
        lambda base: base.filter("day = '2024-01-01' AND user_id <> 3"),
        affected=["2024-01-01"],
        stats_cols=["event_id"],
    )
    cur = read_keyed_table(spark, table)
    print(
        "post-erasure user 3 rows on 01-01:",
        cur.filter("day = '2024-01-01' AND user_id = 3").count(),
    )

    # --- 5. time travel + restore ---------------------------------------
    v_before = table_history(table)[-2]["version"]
    old = read_keyed_table(spark, table, version=v_before)
    print("time-travel rows (pre-erasure):", old.count(), "current:", cur.count())
    v_new = restore_table_version(table, v_before)
    print("restored as version", v_new, "rows:", read_keyed_table(spark, table).count())

    # --- 6. retention ----------------------------------------------------
    out = vacuum_versions(table, keep_last=2)
    print("vacuumed versions:", out["versions"], "dirs:", len(out["dirs"]))
    print("final rows:", read_keyed_table(spark, table).count())

    # --- 7. CHECK constraints (ALTER TABLE ADD CONSTRAINT) --------------
    # Validates existing data first; afterwards EVERY write transaction
    # enforces the checks before its CAS — no per-writer opt-in.
    from nshm2022db_spark.streaming.sinks import (
        ConstraintViolation,
        set_table_constraints,
    )

    set_table_constraints(spark, table, ["event_id >= 0", "user_id IS NOT NULL"])
    try:
        append_partition_transaction(
            spark, table, "day",
            spark.createDataFrame(
                [(-1, 0, "2024-01-01")], "event_id long, user_id long, day string"
            ),
        )
    except ConstraintViolation as e:
        print("constraint blocked bad batch:", e)

    # --- 8. Bloom equality skipping -------------------------------------
    # Range stats can't prune a point probe on an unsorted column; a
    # per-partition Bloom bitmap can. Build on append, probe via
    # prune={col: ("eq", value)}.
    append_partition_transaction(
        spark, table, "day",
        spark.range(5000, 5200).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.lit("2024-01-04").alias("day"),
        ),
        stats_cols=["event_id"], bloom_cols=["user_id"],
    )
    probe = read_keyed_table(spark, table, prune={"user_id": ("eq", 3)})
    print("bloom-probed files:", len(probe.inputFiles()))

    # --- 9. metadata-only COUNT -----------------------------------------
    from nshm2022db_spark.streaming.sinks import read_partition_counts

    counts = read_partition_counts(spark, table)
    print("counts from manifest (files opened:", len(counts.inputFiles()), "):")
    counts.orderBy("day").show(truncate=False)

    # --- 10. shallow clone ----------------------------------------------
    # Zero-copy dev fork: the clone references this table's data dirs;
    # both evolve independently afterwards.
    from nshm2022db_spark.streaming.sinks import clone_table_shallow

    clone = tempfile.mkdtemp(prefix="events_clone_")
    clone_table_shallow(table, clone)
    print("clone rows:", read_keyed_table(spark, clone).count(), "(0 bytes copied)")

    # --- 11. CDC-maintained rollup (incremental materialized view) -----
    # A derived aggregate refreshed from an APPEND-ONLY landing table's
    # change feed; the cursor lives in the rollup's own commit ledger
    # (exactly-once per source version). Additive maintenance over a
    # table with rewrites/restores/vacuumed history raises instead of
    # silently double-counting — which is why this uses a fresh
    # append-only bronze, the shape a landing zone actually has.
    from nshm2022db_spark.streaming.sinks import maintain_incremental_agg

    bronze = tempfile.mkdtemp(prefix="events_bronze_")
    for bid in range(3):
        append_partition_transaction(
            spark, bronze, "day",
            spark.range(bid * 500, bid * 500 + 500).select(
                F.col("id").alias("event_id"),
                (F.col("id") % 7).alias("user_id"),
                F.lit(f"2024-02-0{bid + 1}").alias("day"),
            ),
            batch_id=bid,
        )
    rollup = tempfile.mkdtemp(prefix="events_rollup_")

    def refresh() -> int:
        return maintain_incremental_agg(
            spark, bronze, rollup,
            agg=lambda d: d.groupBy("day").agg(F.count(F.lit(1)).alias("n")),
            merge=lambda cur_df, add: add if cur_df is None else (
                cur_df.unionByName(add).groupBy("day").agg(F.sum("n").alias("n"))
            ),
        )

    print("rollup commits applied:", refresh(), "(re-run applies:", refresh(), ")")

    # --- 12. conditional MERGE INTO (r10) --------------------------------
    # Delta's full MERGE surface as one commit: conditions and SET
    # expressions are SQL over the source (s) and target (t) structs;
    # untouched partitions carry byte-identical, delete-only partitions
    # take the deletion-vector path, and evolve_schema adds source-only
    # columns (older files read them as NULL).
    from nshm2022db_spark.streaming.sinks import merge_into_table

    cdc = spark.createDataFrame(
        [(10, 990.0, "fixup"), (11, 0.0, "drop"), (9999, 5.0, "new")],
        "event_id long, amount double, op string",
    )
    metrics = merge_into_table(
        spark, bronze, cdc, ["event_id"],
        when_matched_update={"user_id": "CAST(s.amount AS BIGINT)"},
        when_matched_update_condition="s.op = 'fixup'",
        when_matched_delete="s.op = 'drop'",
        when_not_matched_insert={
            "event_id": "s.event_id",
            "user_id": "0",
            "day": "'2024-02-09'",
        },
        evolve_schema=False,
    )
    print("merge metrics:", metrics)

    # --- 13. typed change feed, batch and streaming (r10) ----------------
    # Delta CDF's _change_type surface: per commit, inserts/deletes as
    # exact state diffs; apply_typed_changes folds the feed back into
    # the table it encodes. The same feed streams via
    # .format("commitlog").option("changeTypes", "true").
    from nshm2022db_spark.streaming.sinks import (
        apply_typed_changes,
        read_table_changes_typed,
    )

    feed = read_table_changes_typed(spark, bronze, from_version=0)
    feed.groupBy("_commit_version", "_change_type").count().orderBy(
        "_commit_version"
    ).show(truncate=False)
    replica = apply_typed_changes(feed, ["event_id", "user_id", "day"])
    print(
        "replica == head:",
        replica.count() == read_keyed_table(spark, bronze).count(),
    )


if __name__ == "__main__":
    main()
