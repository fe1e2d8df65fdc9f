"""Engine-portable expression builders.

Every extension operator (dedup, similarity, text analysis) is verified
against a DuckDB oracle by value hash, so each primitive here is emitted
TWICE from one template: a Spark SQL fragment (wrapped in F.expr) and a
DuckDB fragment. The pairs are kept adjacent and tested for agreement
(tests/test_portable.py) — if you change one side, change the other.

Determinism rules that make exact cross-engine matches possible:
  * integer hashing is polynomial-mod arithmetic (p = 1e9+7) — no
    engine-native hash() anywhere (murmur seeds differ between engines);
  * floating-point reductions are SEQUENTIAL LEFT FOLDS on both sides
    (Spark `aggregate`, DuckDB `list_reduce` with a prepended init) —
    same products, same order, IEEE doubles match bit-for-bit;
  * randomness is a fixed multiplicative-congruence formula evaluated
    in-plan, never a driver-side RNG.
"""

from __future__ import annotations

P = 1_000_000_007  # hash modulus; a*x stays < 2^63 for a,x < p

# CAREFUL: Spark SQL string literals process backslash escapes ('\s' → 's'),
# DuckDB string literals do not — regex patterns need one extra backslash
# level on the Spark side only.
#
# The class is EXPLICIT, not \s: Java's \s includes \x0B (vertical tab)
# where RE2's does not, so a corpus containing VT would tokenize
# differently per engine (caught by the randomized sweep in
# test_properties.py). Neither engine's \s matches unicode spaces
# (U+00A0 etc.) by default, so those stay inside tokens on both —
# consistent, which is all determinism needs.
SPARK_TOKEN_SPLIT = r"[ \\t\\n\\x0B\\f\\r]+"
DUCK_TOKEN_SPLIT = r"[ \t\n\x0B\f\r]+"


ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


# -- ASCII-only case fold ----------------------------------------------------
# NOT lower(): full Unicode case mapping diverges between engines (Java
# lowers U+0130 to 'i' + combining dot, DuckDB to plain 'i') and is
# locale-fraught besides — deterministic pipelines fold ASCII only, via
# translate(), which both engines implement identically.

def spark_ascii_lower(col: str) -> str:
    return f"translate({col}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def duck_ascii_lower(col: str) -> str:
    return f"translate({col}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


# -- whitespace-collapse normalization (exact-dedup fingerprint input) -------
# Same explicit class as the tokenizers; ASCII fold per above.

def spark_norm_text(col: str) -> str:
    return spark_ascii_lower(
        f"regexp_replace(trim({col}), '{SPARK_TOKEN_SPLIT}', ' ')"
    )


def duck_norm_text(col: str) -> str:
    return duck_ascii_lower(
        f"regexp_replace(trim({col}), '{DUCK_TOKEN_SPLIT}', ' ', 'g')"
    )


# -- whitespace tokens -------------------------------------------------------

def spark_tokens(col: str) -> str:
    return f"filter(split({col}, '{SPARK_TOKEN_SPLIT}'), t -> t <> '')"


def duck_tokens(col: str) -> str:
    return f"list_filter(string_split_regex({col}, '{DUCK_TOKEN_SPLIT}'), t -> t <> '')"


# -- polynomial char hash of a string → bigint in [0, p) ---------------------

def spark_char_hash(col: str) -> str:
    return (
        f"aggregate(transform(split({col}, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"0L, (acc, c) -> (acc * 31 + c) % {P})"
    )


def duck_char_hash(col: str) -> str:
    # (?s) dotall: RE2's bare '.' excludes newlines, which would silently
    # DROP \n characters from the fold while Spark's split('') keeps
    # them. Registered oracles only ever hash whitespace-free tokens, so
    # they never hit it — but the primitive's contract is agreement on
    # ANY string (pinned by the randomized test in test_properties.py).
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(regexp_extract_all({col}, '(?s).'), c -> ord(c)::BIGINT)), "
        f"(acc, c) -> (acc * 31 + c) % {P})"
    )


# -- token 3-gram shingles (distinct) ----------------------------------------
# Guard: Spark sequence(1, 0) yields [1, 0] (descending!) so the size >= 3
# case must be explicit; DuckDB range(1, n) is empty for n <= 1.

def spark_shingles(tokens_expr: str) -> str:
    return (
        f"array_distinct(CASE WHEN size({tokens_expr}) >= 3 THEN "
        f"transform(sequence(1, size({tokens_expr}) - 2), "
        f"i -> concat_ws(' ', {tokens_expr}[i-1], {tokens_expr}[i], {tokens_expr}[i+1])) "
        f"ELSE array() END)"
    )


def duck_shingles(tokens_expr: str) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tokens_expr}) - 1, 1)), "
        f"i -> {tokens_expr}[i] || ' ' || {tokens_expr}[i+1] || ' ' || {tokens_expr}[i+2]))"
    )


# -- hashed token 3-gram shingles (distinct), cheap form ---------------------
# Hash each TOKEN once (char-level fold), then combine three consecutive
# token hashes arithmetically: (h1·31² + h2·31 + h3) mod p. ~15× less char
# work than hashing shingle strings; identical on both engines.

def spark_token_hashes(tokens_expr: str) -> str:
    return f"transform({tokens_expr}, t -> {spark_char_hash('t')})"


def spark_shingle_hashes(hx: str) -> str:
    return (
        f"array_distinct(CASE WHEN size({hx}) >= 3 THEN "
        f"transform(sequence(1, size({hx}) - 2), "
        f"i -> ({hx}[i-1] * 961 + {hx}[i] * 31 + {hx}[i+1]) % {P}) "
        f"ELSE array() END)"
    )


def duck_token_hashes(tokens_expr: str) -> str:
    return f"list_transform({tokens_expr}, t -> {duck_char_hash('t')})"


def duck_shingle_hashes(hx: str) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({hx}) - 1, 1)), "
        f"i -> ({hx}[i] * 961 + {hx}[i+1] * 31 + {hx}[i+2]) % {P}))"
    )


# -- sequential-fold double dot product of two float arrays ------------------
# CAUTION (DuckDB 1.0.0): these folds are safe over per-row COMPUTED lists
# (stressed 12/12 clean across fresh processes — tools/oracle_determinism.py)
# but `list_reduce` over a GROUPED list column (built by `list(... ORDER BY)`
# under GROUP BY) is nondeterministic under parallel execution when the
# grouped rows span morsels. Never apply these to large grouped lists in
# oracle SQL; use layered windows instead (see session_funnel's oracle).

def spark_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )


# -- deterministic pseudo-random hyperplane component ------------------------
# r_{j,i} = frac((j*DIM + i) * 2654435761 / 1000003) - 0.5, computed with
# exact integer mod then one double division — identical on both engines.

HYPERPLANE_MULT = 2_654_435_761
HYPERPLANE_MOD = 1_000_003


def spark_hyperplane_dot(vec: str, j: int, dim: int) -> str:
    return (
        f"aggregate(zip_with({vec}, transform(sequence(0, {dim - 1}), "
        f"i -> CAST((({j} * {dim} + i) * {HYPERPLANE_MULT}) % {HYPERPLANE_MOD} AS DOUBLE) "
        f"/ {HYPERPLANE_MOD}.0 - 0.5), "
        f"(x, r) -> CAST(x AS DOUBLE) * r), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_hyperplane_dot(vec: str, j: int, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> {vec}[i]::DOUBLE * "
        f"(((({j} * {dim} + (i - 1)) * {HYPERPLANE_MULT}) % {HYPERPLANE_MOD})::DOUBLE "
        f"/ {HYPERPLANE_MOD}.0 - 0.5))), (acc, v) -> acc + v)"
    )


# -- minhash parameter table (fixed, shared by both engines) -----------------
# h_i(x) = (a_i * x + b_i) mod p ; a_i, b_i derived from a fixed LCG so the
# oracle SQL can inline the same literals.

def minhash_params(k: int) -> list[tuple[int, int, int]]:
    params = []
    state = 88172645463325252
    for i in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % P
        params.append((i, a, b))
    return params


def spark_sqdist(a: str, b: str) -> str:
    """Squared L2 distance with the SAME left-to-right fold order as
    duck_sqdist (and as a sequential NumPy subtract-square-sum in
    float64) — the PQ encode/ADC primitive (r12)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_sqdist(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) "
        f"* ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), (acc, v) -> acc + v)"
    )
