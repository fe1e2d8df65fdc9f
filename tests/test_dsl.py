"""DSL front-end unit tests.

Mirrors the reference's golden token-stream / expression-tree tests
(/root/reference/tests/test_query.py:15-70) — same accepted language, same
precedence — plus the documented deviations (compound NOT works here).
"""

from __future__ import annotations

import pytest

from nshm2022db_spark.dsl import (
    And,
    Name,
    Not,
    Or,
    TokenType,
    parse_query,
    tokenize,
)
from nshm2022db_spark.dsl.compiler import atom_names, compile_to_sql_predicate


def types(q):
    return [t.type for t in tokenize(q)]


def values(q):
    return [t.value for t in tokenize(q)]


class TestLexer:
    def test_golden_tokens(self):
        # reference golden stream: tests/test_query.py:15-26
        q = "Alpine Fault & !(Kakapo | Hope)"
        assert values(q) == ["Alpine Fault", "&", "!", "(", "Kakapo", "|", "Hope", ")"]
        assert types(q) == [
            TokenType.NAME,
            TokenType.AND,
            TokenType.NOT,
            TokenType.LPAREN,
            TokenType.NAME,
            TokenType.OR,
            TokenType.NAME,
            TokenType.RPAREN,
        ]

    def test_names_keep_internal_spaces_and_colons(self):
        assert values("Fiordland: Section 3") == ["Fiordland: Section 3"]

    def test_bad_character_raises(self):
        # reference: ValueError on chars outside the alphabet (query.py:146-148)
        with pytest.raises(ValueError, match="Unexpected character"):
            tokenize("Alpine Fault @ Hope")

    def test_whitespace_between_operators(self):
        assert types("a  &  b") == [TokenType.NAME, TokenType.AND, TokenType.NAME]


class TestParser:
    def test_golden_tree(self):
        # reference golden tree: tests/test_query.py:54-63
        assert parse_query("Alpine Fault & !(Kakapo | Hope)") == And(
            Name("Alpine Fault"), Not(Or(Name("Kakapo"), Name("Hope")))
        )

    def test_precedence_and_over_or(self):
        assert parse_query("a | b & c") == Or(Name("a"), And(Name("b"), Name("c")))

    def test_left_associative(self):
        assert parse_query("a & b & c") == And(And(Name("a"), Name("b")), Name("c"))
        assert parse_query("a | b | c") == Or(Or(Name("a"), Name("b")), Name("c"))

    def test_not_binds_tightest(self):
        assert parse_query("!a & b") == And(Not(Name("a")), Name("b"))

    def test_parens_override(self):
        assert parse_query("(a | b) & c") == And(Or(Name("a"), Name("b")), Name("c"))

    def test_compound_not_supported(self):
        # documented deviation: reference raises TypeError (query.py:267-270)
        assert parse_query("!(a & b)") == Not(And(Name("a"), Name("b")))

    def test_unbalanced_paren_raises(self):
        with pytest.raises(ValueError, match="closing parenthesis"):
            parse_query("(a | b")

    def test_trailing_tokens_raise(self):
        with pytest.raises(ValueError, match="Trailing|Expected operator"):
            parse_query("a b (")

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="Unexpected end"):
            parse_query("")

    def test_dangling_operator_raises(self):
        with pytest.raises(ValueError, match="Unexpected"):
            parse_query("a &")


class TestCompiler:
    def test_atom_order_is_in_order_traversal(self):
        # mirrors the reference's bind-parameter ordering (query.py:277-293)
        tree = parse_query("b & (a | b) & !c")
        assert atom_names(tree) == ["b", "a", "c"]

    def test_sql_predicate_rendering(self):
        tree = parse_query("a & !(b | c)")
        flags = {a: f"__m{i}" for i, a in enumerate(atom_names(tree))}
        assert (
            compile_to_sql_predicate(tree, flags)
            == "(__m0 AND (NOT (__m1 OR __m2)))"
        )
