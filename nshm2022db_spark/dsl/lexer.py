"""DSL lexer (reference semantics: nshmdb/query.py:105-151).

Token inventory: `( ) & | !` plus name atoms matching
``[a-zA-Z0-9\\-_: ]+`` (names may contain spaces/colons — "Alpine Fault",
"Fiordland: Section 3"). Any other character is a lex error, matching the
reference's ValueError (query.py:146-148).

The reference tags `&`/`|` as UNARY_OPERATOR and `!` as INFIX_OPERATOR — a
verified label swap that is internally consistent (SURVEY §2.9). We use
honest names; behavior (the accepted language) is identical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class TokenType(Enum):
    LPAREN = "("
    RPAREN = ")"
    AND = "&"
    OR = "|"
    NOT = "!"
    NAME = "name"


@dataclass(frozen=True)
class Token:
    type: TokenType
    value: str


_PUNCT = {
    "(": TokenType.LPAREN,
    ")": TokenType.RPAREN,
    "&": TokenType.AND,
    "|": TokenType.OR,
    "!": TokenType.NOT,
}

_NAME_RE = re.compile(r"[a-zA-Z0-9\-_:#. ]+")


def tokenize(query: str) -> list[Token]:
    """Lex ``query`` into tokens.

    Raises ValueError on any character outside the token alphabet, like the
    reference (query.py:146-148). Name runs are stripped of surrounding
    whitespace; whitespace between operators is skipped.

    Note: the atom alphabet adds ``#`` and ``.`` beyond the reference's
    (query.py:124) so star-schema atoms like ``Brand#1`` are addressable;
    a superset of the accepted language, existing queries unchanged.
    """
    tokens: list[Token] = []
    i = 0
    n = len(query)
    while i < n:
        ch = query[i]
        if ch in _PUNCT:
            tokens.append(Token(_PUNCT[ch], ch))
            i += 1
            continue
        m = _NAME_RE.match(query, i)
        if m:
            text = m.group(0).strip()
            if text:
                tokens.append(Token(TokenType.NAME, text))
            i = m.end()
            continue
        raise ValueError(f"Unexpected character {ch!r} at position {i} in query {query!r}")
    return tokens
