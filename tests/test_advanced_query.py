"""Integration tests for the flagship advanced query on the NSHM schema.

Fixture translates the reference's canonical "Alpine Fault" single-row
fixture (/root/reference/tests/test_nshmdb.py:21-33) to DataFrames, extended
with a second fault/rupture so membership logic is actually exercised
(the reference's own DSL test pins: query "Alpine Fault" → rupture nshm_id 1
with magnitude 6.5 and rate 0.01, tests/test_nshmdb.py:120-127).
"""

from __future__ import annotations

import pytest

from nshm2022db_spark.plans import AdvancedQueryTables, advanced_query
from nshm2022db_spark.schemas import FAULT, PARENT_FAULT, RUPTURE, RUPTURE_FAULTS


@pytest.fixture(scope="module")
def nshm(spark):
    parent = spark.createDataFrame(
        [(1, "Alpine Fault"), (2, "Hope Fault")], schema=PARENT_FAULT
    )
    fault = spark.createDataFrame(
        [(1, 1, 3, 90.0, None, 1), (2, 2, 3, 45.0, None, 2)], schema=FAULT
    )
    rupture = spark.createDataFrame(
        [
            (1, 3, 1, 100.0, 6.5, 10.0, 0.01),   # Alpine only
            (2, 3, 2, 250.0, 7.1, 30.0, 0.002),  # Alpine + Hope
            (3, 3, 3, 50.0, 5.9, 5.0, None),     # Hope only, NULL rate
        ],
        schema=RUPTURE,
    )
    bridge = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 1), (3, 2, 2), (4, 3, 2)], schema=RUPTURE_FAULTS
    )
    dim = fault.join(parent, "parent_id").select("fault_id", "name")
    return AdvancedQueryTables(
        fact=rupture,
        bridge=bridge,
        dim=dim,
        fact_key="rupture_id",
        bridge_fact_key="rupture_id",
        bridge_dim_key="fault_id",
        dim_key="fault_id",
        name_col="name",
        rate_col="rate",
        magnitude_col="magnitude",
    )


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestAdvancedQuery:
    def test_single_atom_golden(self, nshm):
        # reference golden: tests/test_nshmdb.py:120-127
        got = rows(advanced_query(nshm, "Alpine Fault").select("nshm_id", "magnitude", "rate"))
        assert got == [(1, 6.5, 0.01), (2, 7.1, 0.002)]

    def test_and(self, nshm):
        got = rows(advanced_query(nshm, "Alpine Fault & Hope Fault").select("rupture_id"))
        assert got == [(2,)]

    def test_negation(self, nshm):
        got = rows(advanced_query(nshm, "Alpine Fault & !Hope Fault").select("rupture_id"))
        assert got == [(1,)]

    def test_compound_not(self, nshm):
        # rupture 3 has NULL rate → excluded by the IS NOT NULL pre-filter
        got = rows(advanced_query(nshm, "!(Alpine Fault & Hope Fault)").select("rupture_id"))
        assert got == [(1,)]

    def test_null_rate_excluded(self, nshm):
        got = rows(advanced_query(nshm, "Hope Fault").select("rupture_id"))
        assert got == [(2,)]

    def test_rate_bounds_zero_is_honored(self, nshm):
        # deviation from reference truthiness quirk (query.py:298-314)
        got = rows(
            advanced_query(nshm, "Alpine Fault", rate_bounds=(0.0, 0.005)).select("rupture_id")
        )
        assert got == [(2,)]

    def test_magnitude_bounds(self, nshm):
        got = rows(
            advanced_query(nshm, "Alpine Fault", magnitude_bounds=(7.0, None)).select("rupture_id")
        )
        assert got == [(2,)]

    def test_fault_count_limit(self, nshm):
        got = rows(
            advanced_query(nshm, "Alpine Fault", fault_count_limit=1).select("rupture_id")
        )
        assert got == [(1,)]

    def test_order_by_rate_desc_and_limit(self, nshm):
        got = rows(advanced_query(nshm, "Alpine Fault", limit=1).select("rupture_id"))
        assert got == [(1,)]  # rate 0.01 > 0.002


class TestEntryContract:
    def test_entry_smoke(self, spark):
        import __spark_entry__ as mod

        df = mod.entry(spark)
        assert df.count() >= 0
        assert set(mod.oracle_sql()) <= set(mod.queries())
