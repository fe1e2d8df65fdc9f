"""Tests for the verify_local typed-schema gate (VERDICT r04 #2).

The driver's value hash is Arrow-typed: DuckDB HUGEINT reaches it as
decimal128(38,0) while Spark emits int64, so an uncast integer SUM in an
oracle fails the driver hash even when every value matches (the r4
multimodal wsum bug). These tests pin that the local gate now goes red on
exactly that fixture class before the driver ever sees it.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from verify_local import schema_type_mismatches, type_family  # noqa: E402


def _duck(sql):
    res = duckdb.connect().sql(sql)
    return [d[0] for d in res.description], [str(t) for t in res.types]


class TestTypeFamily:
    def test_int_widths_collapse(self):
        for t in ("tinyint", "smallint", "int", "integer", "bigint", "BIGINT"):
            assert type_family(t) == "int"

    def test_hugeint_and_decimal_are_their_own_family(self):
        assert type_family("HUGEINT") == "decimal"
        assert type_family("DECIMAL(38,0)") == "decimal"
        assert type_family("decimal(10,2)") == "decimal"
        assert type_family("HUGEINT") != type_family("bigint")

    def test_float_str_bool_date_ts(self):
        assert type_family("DOUBLE") == type_family("double") == "float"
        assert type_family("VARCHAR") == type_family("string") == "str"
        assert type_family("BOOLEAN") == type_family("boolean") == "bool"
        assert type_family("DATE") == type_family("date") == "date"
        assert type_family("TIMESTAMP WITH TIME ZONE") == "timestamp"
        assert type_family("timestamp") == "timestamp"

    def test_lists_compare_element_family(self):
        assert type_family("INTEGER[]") == "list<int>"
        assert type_family("array<bigint>") == "list<int>"
        assert type_family("DOUBLE[]") == "list<float>"
        assert type_family("array<double>") == "list<float>"


class TestSchemaTypeMismatches:
    def test_uncast_sum_goes_red(self):
        # The exact r4 bug: SUM(BIGINT) in DuckDB is HUGEINT.
        dcols, dtypes = _duck("SELECT SUM(x) AS wsum FROM range(5) t(x)")
        bad = schema_type_mismatches([("wsum", "bigint")], dcols, dtypes)
        assert len(bad) == 1 and "wsum" in bad[0] and "decimal" in bad[0]

    def test_cast_sum_is_clean(self):
        dcols, dtypes = _duck(
            "SELECT CAST(SUM(x) AS BIGINT) AS wsum FROM range(5) t(x)"
        )
        assert schema_type_mismatches([("wsum", "bigint")], dcols, dtypes) == []

    def test_typical_agg_row_is_clean(self):
        dcols, dtypes = _duck(
            "SELECT COUNT(*) AS c, AVG(x) AS a, MAX(x)::INTEGER AS m,"
            " 'k' AS k FROM range(5) t(x)"
        )
        spark_dtypes = [
            ("c", "bigint"), ("a", "double"), ("m", "int"), ("k", "string"),
        ]
        assert schema_type_mismatches(spark_dtypes, dcols, dtypes) == []

    def test_int_vs_float_goes_red(self):
        dcols, dtypes = _duck("SELECT AVG(x) AS v FROM range(5) t(x)")
        bad = schema_type_mismatches([("v", "bigint")], dcols, dtypes)
        assert len(bad) == 1 and "float" in bad[0]

    def test_extra_duckdb_column_ignored_here(self):
        # Column-set mismatches are the caller's check; this one only
        # compares columns present on both sides.
        dcols, dtypes = _duck("SELECT 1::BIGINT AS a, 2::BIGINT AS b")
        assert schema_type_mismatches([("a", "bigint")], dcols, dtypes) == []
