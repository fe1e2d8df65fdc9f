"""Unit tests for the operator modules on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from nshm2022db_spark.operators import (
    dense_surrogate_keys,
    nearest_ge_lookup,
    nearest_ge_lookup_per_key,
    top_k_per_group,
    upsert_missing,
    weighted_branch_merge,
)
from nshm2022db_spark.operators.reshape import parse_ragged_indices


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestNearestGe:
    def test_rounds_up_and_clamps(self, spark):
        # reference semantics nshmdb.py:215-221: smallest distinct value >=
        # target, clamped to the max
        domain = spark.createDataFrame([(5.0,), (6.5,), (7.2,), (6.5,)], "v double")
        targets = spark.createDataFrame([(6.0,), (6.5,), (9.0,), (1.0,)], "t double")
        got = rows(nearest_ge_lookup(domain, "v", targets, "t"), "t", "rounded")
        assert got == [(1.0, 5.0), (6.0, 6.5), (6.5, 6.5), (9.0, 7.2)]

    def test_per_key_clamps_within_key(self, spark):
        domain = spark.createDataFrame(
            [("a", 5.0), ("a", 7.0), ("b", 6.0)], "k string, v double"
        )
        targets = spark.createDataFrame(
            [("a", 6.0), ("a", 8.0), ("b", 1.0)], "k string, t double"
        )
        got = rows(
            nearest_ge_lookup_per_key(domain, "k", "v", targets, "k", "t"),
            "k",
            "t",
            "rounded",
        )
        assert got == [("a", 6.0, 7.0), ("a", 8.0, 7.0), ("b", 1.0, 6.0)]


class TestKeys:
    def test_dense_surrogates_are_dense_and_ordered(self, spark):
        df = spark.createDataFrame([("c",), ("a",), ("b",)], "name string")
        got = rows(dense_surrogate_keys(df, ["name"], "id"), "name", "id")
        assert got == [("a", 1), ("b", 2), ("c", 3)]

    def test_upsert_missing_is_anti_join(self, spark):
        new = spark.createDataFrame([("x",), ("y",)], "name string")
        existing = spark.createDataFrame([("y",)], "name string")
        assert rows(upsert_missing(new, existing, ["name"]), "name") == [("x",)]


class TestWeightedMerge:
    def test_weighted_sum_across_branches(self, spark):
        b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, rate double")
        b2 = spark.createDataFrame([(1, 100.0)], "k long, rate double")
        got = rows(weighted_branch_merge([(0.5, b1), (0.1, b2)], ["k"]), "k", "rate")
        assert got == [(1, 15.0), (2, 10.0)]


class TestRaggedParser:
    def test_parse(self, spark):
        lines = spark.createDataFrame(
            [("7,3,1,2,5",), ("9,1,4",), ("11,0",)], "value string"
        )
        got = rows(parse_ragged_indices(lines), "rupture_id", "fault_id")
        assert got == [(7, 1), (7, 2), (7, 5), (9, 4)]

    def test_header_and_padding_skipped(self, spark):
        """Real solution files start with a header line and may pad rows
        with trailing empty cells; the reference skips the header and
        slices exactly n entries (api.py:377-385) — so do we (under ANSI
        a plain cast would crash the ingest on 'Rupture Index')."""
        lines = spark.createDataFrame(
            [
                ("Rupture Index,Num Sections,# 1,# 2",),
                ("7,2,1,2,,",),   # padded row: slice stops at n=2
                ("9,1,4",),
            ],
            "value string",
        )
        got = rows(parse_ragged_indices(lines), "rupture_id", "fault_id")
        assert got == [(7, 1), (7, 2), (9, 4)]


class TestTopK:
    def test_per_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v long"
        )
        got = rows(top_k_per_group(df, ["g"], [F.col("v").desc()], 2), "g", "v")
        assert got == [("a", 2), ("a", 3), ("b", 9)]
