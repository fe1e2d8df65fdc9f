"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none).

Two laws pinned over randomized inputs:
* DSL round trip: any expression tree, rendered fully parenthesized,
  parses back to the same tree; and the compiled SQL predicate evaluated
  by DuckDB agrees with a 5-line reference evaluator on random
  membership assignments.
* nearest-≥ semantics: the distributed asof operator agrees with the
  reference's np.searchsorted formulation (nshmdb.py:215-221) on random
  domains and targets, including the clamp-to-max edge.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nshm2022db_spark.dsl.compiler import atom_names, compile_to_sql_predicate
from nshm2022db_spark.dsl.parser import And, Name, Not, Or, parse_query

ATOMS = ["Alpine Fault", "Hope Fault", "Kakapo", "Brand#1", "F-2: Section 9"]


def trees(depth: int = 4):
    leaf = st.sampled_from(ATOMS).map(Name)
    return st.recursive(
        leaf,
        lambda sub: st.one_of(
            st.tuples(sub, sub).map(lambda p: And(p[0], p[1])),
            st.tuples(sub, sub).map(lambda p: Or(p[0], p[1])),
            sub.map(Not),
        ),
        max_leaves=8,
    )


def render(t) -> str:
    """Fully parenthesized rendering — parse must invert it exactly."""
    if isinstance(t, Name):
        return t.value
    if isinstance(t, Not):
        return f"!({render(t.operand)})"
    op = "&" if isinstance(t, And) else "|"
    return f"({render(t.left)} {op} {render(t.right)})"


def evaluate(t, members: set[str]) -> bool:
    """Reference semantics: membership of atoms under &, |, !."""
    if isinstance(t, Name):
        return t.value in members
    if isinstance(t, Not):
        return not evaluate(t.operand, members)
    if isinstance(t, And):
        return evaluate(t.left, members) and evaluate(t.right, members)
    return evaluate(t.left, members) or evaluate(t.right, members)


class TestDSLProperties:
    @settings(max_examples=200, deadline=None)
    @given(trees())
    def test_render_parse_roundtrip(self, tree):
        assert parse_query(render(tree)) == tree

    @settings(max_examples=100, deadline=None)
    @given(trees(), st.sets(st.sampled_from(ATOMS)))
    def test_sql_codegen_agrees_with_reference_evaluator(self, tree, members):
        atoms = atom_names(tree)
        flags = {a: f"f{i}" for i, a in enumerate(atoms)}
        sql = compile_to_sql_predicate(tree, flags)
        cols = ", ".join(
            f"{str(a in members).lower()} AS f{i}" for i, a in enumerate(atoms)
        )
        got = duckdb.sql(f"SELECT ({sql}) AS r FROM (SELECT {cols})").fetchone()[0]
        assert got == evaluate(tree, members)


class TestAsofProperty:
    def test_matches_searchsorted_reference(self, spark):
        """One Spark job over 200 random targets vs the reference's
        np.searchsorted + clamp (nshmdb.py:215-221) on a random domain."""
        from nshm2022db_spark.operators.asof import nearest_ge_lookup

        rng = np.random.default_rng(7)
        domain_vals = np.unique(rng.uniform(0, 1000, 300).round(3))
        targets_vals = np.concatenate(
            [
                rng.uniform(-100, 1100, 190).round(3),
                domain_vals[:5],  # exact hits
                [domain_vals.max(), domain_vals.max() + 1e-9],  # clamp edge
                [-1e9, 1e9, 0.0],
            ]
        )
        domain = spark.createDataFrame([(float(v),) for v in domain_vals], "v double")
        targets = spark.createDataFrame(
            [(float(t),) for t in np.unique(targets_vals)], "t double"
        )
        got = {
            r.t: r.rounded
            for r in nearest_ge_lookup(domain, "v", targets, "t").collect()
        }

        # reference formulation, nshmdb.py:215-221
        srt = np.sort(domain_vals)
        for t in np.unique(targets_vals):
            idx = min(int(np.searchsorted(srt, t)), len(srt) - 1)
            assert got[float(t)] == float(srt[idx]), t


class TestPortableRandomized:
    """Randomized cross-engine agreement for the portable primitives:
    a pure-Python reference model evaluated against BOTH engines over
    seeded random strings — one Spark job and one DuckDB query for the
    whole batch, so the sweep stays fast. Fixed seed → reproducible."""

    @staticmethod
    def _py_tokens(s):
        # the pinned explicit class of portable.SPARK/DUCK_TOKEN_SPLIT —
        # NOT \s (python's includes unicode spaces neither engine splits)
        return [t for t in __import__("re").split(r"[ \t\n\x0b\f\r]+", s) if t != ""]

    @staticmethod
    def _py_char_hash(s):
        from nshm2022db_spark.functions.portable import P

        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % P
        return acc

    @staticmethod
    def _py_ascii_lower(s):
        from nshm2022db_spark.functions.portable import ASCII_LOWER, ASCII_UPPER

        return s.translate(str.maketrans(ASCII_UPPER, ASCII_LOWER))

    @classmethod
    def _py_shingle_hashes(cls, s):
        from nshm2022db_spark.functions.portable import P

        hx = [cls._py_char_hash(t) for t in cls._py_tokens(cls._py_ascii_lower(s))]
        out = []
        for i in range(len(hx) - 2):
            out.append((hx[i] * 961 + hx[i + 1] * 31 + hx[i + 2]) % P)
        seen, dedup = set(), []
        for x in out:
            if x not in seen:
                seen.add(x)
                dedup.append(x)
        return dedup

    def test_random_strings_agree_with_model(self, spark):
        import random

        import duckdb
        from pyspark.sql import functions as F

        from nshm2022db_spark.functions.portable import (
            duck_ascii_lower,
            duck_char_hash,
            duck_shingle_hashes,
            duck_token_hashes,
            duck_tokens,
            spark_ascii_lower,
            spark_char_hash,
            spark_shingle_hashes,
            spark_token_hashes,
            spark_tokens,
        )

        rng = random.Random(20260813)
        alphabet = [chr(c) for c in range(33, 127)] + [" "] * 12 + [
            "\t", "\n", "\x0b", "\f", "\r",
            # unicode: full lower() would diverge on İ (Java: i + combining
            # dot; DuckDB: i) — the ASCII fold sidesteps the whole class
            "İ", "é", "ß", "日", "😀",
        ]
        cases = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
            for _ in range(60)
        ]
        cases += ["", " ", "\t\n", "a", "one two three four five"]

        df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
        got = {
            r.i: (r.h, list(r.sh))
            for r in df.select(
                "i",
                F.expr(spark_char_hash("s")).alias("h"),
                F.expr(
                    spark_shingle_hashes(
                        spark_token_hashes(spark_tokens(spark_ascii_lower("s")))
                    )
                ).alias("sh"),
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in enumerate(cases)])
        duck = {
            r[0]: (r[1], list(r[2]))
            for r in con.sql(
                f"SELECT i, {duck_char_hash('s')} AS h, "
                f"{duck_shingle_hashes(duck_token_hashes(duck_tokens(duck_ascii_lower('s'))))} AS sh "
                "FROM t"
            ).fetchall()
        }
        for i, s in enumerate(cases):
            model = (self._py_char_hash(s), self._py_shingle_hashes(s))
            # Spark preserves first-seen shingle order (array_distinct);
            # DuckDB's list_distinct does not guarantee order, and every
            # consumer treats shingle lists as SETS (explode/unnest), so
            # the duck side compares order-insensitively.
            assert got[i] == model, (i, repr(s), got[i], model)
            assert duck[i][0] == model[0], (i, repr(s), duck[i][0], model[0])
            assert sorted(duck[i][1]) == sorted(model[1]), (i, repr(s))
