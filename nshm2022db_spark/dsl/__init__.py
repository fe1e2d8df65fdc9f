"""The boolean membership DSL (reference: nshmdb/query.py).

`"Alpine Fault & !(Kakapo | Hope)"` → which ruptures involve the Alpine
Fault and neither Kakapo nor Hope. Pipeline here: lexer → Pratt parser →
Spark Column compiler. Unlike the reference (SQL string + ordered bind
params, query.py:220-338) we compile to Column expressions over per-atom
membership aggregates — injection-safe by construction, no parameter
ordering, and Catalyst sees the whole plan.

Documented deviations from reference quirks (SURVEY §2.9):
  * compound NOT — `!(a & b)` — works here; the reference raises TypeError
    (query.py:267-270).
  * bounds of 0/0.0 are honored; the reference's truthiness test silently
    drops them (query.py:298-314).
"""

from nshm2022db_spark.dsl.lexer import Token, TokenType, tokenize
from nshm2022db_spark.dsl.parser import And, Expr, Name, Not, Or, parse, parse_query
from nshm2022db_spark.dsl.compiler import atom_names, compile_predicate, membership_aggs

__all__ = [
    "Token",
    "TokenType",
    "tokenize",
    "And",
    "Or",
    "Not",
    "Name",
    "Expr",
    "parse",
    "parse_query",
    "atom_names",
    "compile_predicate",
    "membership_aggs",
]
