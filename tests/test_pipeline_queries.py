"""Behavioral tests for the batch pipeline queries (queries/pipeline.py).

The DuckDB oracle gate proves value equality; these pin the SEMANTIC
invariants that survive refactors (session gap bound, range-join window,
merge precedence, decile balance) at sf0.001 without an oracle engine.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from nshm2022db_spark.queries.pipeline import (
    SESSION_GAP_US,
    events_sessionize,
    jsonl_scan,
    merge_upsert,
    ntile_buckets,
    range_join_events,
)
from nshm2022db_spark.functions.timecols import epoch_us
from nshm2022db_spark.sources import read_table


class TestSessionize:
    def test_sessions_partition_user_events(self, spark, sf_dir):
        ev_n = read_table(spark, sf_dir, "events").count()
        sess = events_sessionize(spark, sf_dir)
        assert sess.agg(F.sum("n_events")).collect()[0][0] == ev_n

    def test_adjacent_sessions_gap_exceeds_threshold(self, spark, sf_dir):
        """The gap between one session's end and the next session's start
        (same user) must exceed the inactivity threshold — otherwise they
        would be one session."""
        sess = events_sessionize(spark, sf_dir)
        w_prev = F.lag(epoch_us("session_end")).over(
            Window.partitionBy("user_id").orderBy("session_id")
        )
        bad = (
            sess.withColumn("prev_end", w_prev)
            .filter(F.col("prev_end").isNotNull())
            .filter(
                epoch_us("session_start") - F.col("prev_end") <= SESSION_GAP_US
            )
            .count()
        )
        assert bad == 0


class TestRangeJoin:
    def test_matches_naive_equi_join(self, spark, sf_dir):
        """Bucket-blocked plan == naive user-equi-join + range filter."""
        ev = read_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", epoch_us("ts").alias("c_us")
        )
        purch = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            epoch_us("ts").alias("p_us"),
            F.col("event_id").alias("p_id"),
        )
        naive = (
            clicks.join(
                purch,
                (F.col("p_user") == F.col("user_id"))
                & (F.col("p_us") >= F.col("c_us"))
                & (F.col("p_us") < F.col("c_us") + 3_600_000_000),
                "left",
            )
            .groupBy("event_id")
            .agg(F.count("p_id").alias("n"))
        )
        expected = {r.event_id: r.n for r in naive.collect()}
        got = {
            r.event_id: r.n_purchases_1h
            for r in range_join_events(spark, sf_dir).collect()
        }
        assert got == expected


class TestMergeUpsert:
    def test_update_insert_carryover(self, spark, sf_dir):
        orders = read_table(spark, sf_dir, "orders")
        n_orders = orders.count()
        n_new = orders.filter(F.col("o_orderkey") % 1000 == 1).count()
        merged = merge_upsert(spark, sf_dir)
        assert merged.count() == n_orders + n_new
        # every %10 key carries the updated price/status
        sample = merged.filter(F.col("o_orderkey") % 10 == 0).limit(5).collect()
        assert sample and all(r.status == "U" for r in sample)
        # new keys inserted verbatim
        assert (
            merged.filter(F.col("o_orderkey") > 100_000_000)
            .filter((F.col("status") != "N") | (F.col("price") != 42.0))
            .count()
            == 0
        )


class TestNtile:
    def test_deciles_balanced_within_one(self, spark, sf_dir):
        per_lang = (
            ntile_buckets(spark, sf_dir)
            .groupBy("lang")
            .agg((F.max("n") - F.min("n")).alias("spread"), F.count("*").alias("k"))
            .collect()
        )
        assert per_lang and all(r.spread <= 1 for r in per_lang)


class TestJsonlScan:
    def test_matches_parquet_base(self, spark, sf_dir):
        base = (
            read_table(spark, sf_dir, "documents")
            .groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        )
        expected = {(r.source, r.lang): (r.n_docs, r.total_chars) for r in base.collect()}
        got = {
            (r.source, r.lang): (r.n_docs, r.total_chars)
            for r in jsonl_scan(spark, sf_dir).collect()
        }
        assert got == expected


class TestOrcScan:
    def test_matches_parquet_base(self, spark, sf_dir):
        from nshm2022db_spark.queries.pipeline import orc_scan

        base = (
            read_table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") > 25)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        expected = {
            (r.l_returnflag, r.l_linestatus): r.n_items for r in base.collect()
        }
        got = {
            (r.l_returnflag, r.l_linestatus): r.n_items
            for r in orc_scan(spark, sf_dir).collect()
        }
        assert got == expected

    def test_pushdown_and_pruning(self, spark, sf_dir):
        """The quantity predicate reaches the ORC scan and only the five
        landed columns minus the pruned ones are read."""
        from nshm2022db_spark.queries.pipeline import orc_scan

        plan = orc_scan(spark, sf_dir)._jdf.queryExecution().toString()
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity," in plan
        assert "l_orderkey" not in plan.split("ReadSchema")[-1]


class TestSnapshotDiff:
    def test_classification_matches_derivation(self, spark, sf_dir):
        from nshm2022db_spark.queries.pipeline import (
            DIFF_DELETE_MOD,
            DIFF_UPDATE_MOD,
            snapshot_diff,
        )

        diff = snapshot_diff(spark, sf_dir)
        rows = diff.collect()
        removed = {r.o_orderkey for r in rows if r.change_type == "removed"}
        changed = {r.o_orderkey for r in rows if r.change_type == "changed"}
        keys = {
            r.o_orderkey
            for r in read_table(spark, sf_dir, "orders").select("o_orderkey").collect()
        }
        assert removed == {k for k in keys if k % DIFF_DELETE_MOD == 0}
        assert changed == {
            k for k in keys if k % DIFF_UPDATE_MOD == 0 and k % DIFF_DELETE_MOD != 0
        }
        # No unchanged rows may leak into the change feed.
        assert all(r.change_type in ("removed", "changed") for r in rows)
        for r in rows:
            if r.change_type == "changed":
                assert abs(r.new_price - r.old_price - 100.0) < 1e-9


class TestZorderKey:
    def test_interleave_round_trips(self, spark, sf_dir):
        from nshm2022db_spark.queries.pipeline import ZORDER_BITS, zorder_key

        rows = zorder_key(spark, sf_dir).limit(500).collect()
        assert rows
        for r in rows:
            u = t = 0
            for i in range(ZORDER_BITS):
                u |= ((r.zkey >> (2 * i)) & 1) << i
                t |= ((r.zkey >> (2 * i + 1)) & 1) << i
            assert u == r.u16 and t == r.t16, r.event_id
            assert 0 <= r.zkey < (1 << (2 * ZORDER_BITS))


class TestManifestSkipScan:
    def test_reads_only_stat_matching_day_partitions(self, spark, sf_dir):
        """The scale claim: the pruned read opens files from ONLY the day
        partitions whose manifest min/max(event_id) intersects the query
        range — event_id is time-correlated, so that is 1-2 of ~30 days."""
        from nshm2022db_spark.queries.pipeline import (
            SKIP_ID_HI,
            SKIP_ID_LO,
            manifest_skip_scan,
        )
        from nshm2022db_spark.sources.scratch import scratch_path
        from nshm2022db_spark.streaming.sinks import (
            read_keyed_table,
            table_history,
        )

        manifest_skip_scan(spark, sf_dir).collect()  # lands + commits

        path = os.path.join(
            scratch_path("events_day_commit_r5", sf_dir), "events_by_day"
        )
        m = table_history(path)[-1]
        matching = {
            e
            for e, s in m["stats"].items()
            if s["cols"]["event_id"][0] <= SKIP_ID_HI
            and s["cols"]["event_id"][1] >= SKIP_ID_LO
        }
        assert 0 < len(matching) < len(m["partitions"]) / 2, (
            "fixture must make skipping non-trivial"
        )
        pruned = read_keyed_table(
            spark, path, prune={"event_id": (SKIP_ID_LO, SKIP_ID_HI)}
        )
        for f in pruned.inputFiles():
            assert any(e in f for e in matching), f
