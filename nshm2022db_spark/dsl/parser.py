"""Pratt parser for the membership DSL (reference: nshmdb/query.py:157-217).

Precedence (reference binding powers, query.py:21-31):
    NOT (prefix, bp 5)  >  AND (3, 4)  >  OR (1, 2)
Both infix operators are left-associative (lbp < rbp).

AST is a tiny immutable tree: Name | And | Or | Not. The reference's IR is
nested dicts keyed by operator enums (query.py:154); dataclasses give the
same shape with pattern-matching ergonomics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from nshm2022db_spark.dsl.lexer import Token, TokenType, tokenize


@dataclass(frozen=True)
class Name:
    value: str


@dataclass(frozen=True)
class And:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Or:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Not:
    operand: "Expr"


Expr = Union[Name, And, Or, Not]

# (left bp, right bp) — left-associative infix (query.py:21-31)
_INFIX_BP = {TokenType.AND: (3, 4), TokenType.OR: (1, 2)}
_NOT_BP = 5


class _Stream:
    def __init__(self, tokens: list[Token]):
        self._tokens = tokens
        self._pos = 0

    def peek(self) -> Token | None:
        return self._tokens[self._pos] if self._pos < len(self._tokens) else None

    def next(self) -> Token:
        tok = self.peek()
        if tok is None:
            raise ValueError("Unexpected end of query")
        self._pos += 1
        return tok

    @property
    def exhausted(self) -> bool:
        return self._pos >= len(self._tokens)


def _parse_expr(stream: _Stream, min_bp: int) -> Expr:
    tok = stream.next()
    if tok.type is TokenType.NAME:
        lhs: Expr = Name(tok.value)
    elif tok.type is TokenType.NOT:
        # Prefix NOT binds tighter than both infix ops. Compound operands
        # (`!(a & b)`) are supported — deliberate fix of the reference's
        # TypeError on parameterized-generic isinstance (query.py:267-270).
        lhs = Not(_parse_expr(stream, _NOT_BP))
    elif tok.type is TokenType.LPAREN:
        lhs = _parse_expr(stream, 0)
        closing = stream.peek()
        if closing is None or closing.type is not TokenType.RPAREN:
            raise ValueError("Expected closing parenthesis")
        stream.next()
    else:
        raise ValueError(f"Unexpected token {tok.value!r}")

    while True:
        op = stream.peek()
        if op is None or op.type is TokenType.RPAREN:
            break
        if op.type not in _INFIX_BP:
            raise ValueError(f"Expected operator, got {op.value!r}")
        lbp, rbp = _INFIX_BP[op.type]
        if lbp < min_bp:
            break
        stream.next()
        rhs = _parse_expr(stream, rbp)
        lhs = And(lhs, rhs) if op.type is TokenType.AND else Or(lhs, rhs)
    return lhs


def parse(tokens: list[Token]) -> Expr:
    """Parse a token list into an expression tree."""
    stream = _Stream(tokens)
    expr = _parse_expr(stream, 0)
    if not stream.exhausted:
        raise ValueError(f"Trailing tokens after expression: {stream.peek().value!r}")
    return expr


def parse_query(query: str) -> Expr:
    """Lex + parse in one step."""
    return parse(tokenize(query))
