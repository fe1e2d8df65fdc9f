"""Text analysis over the documents table.

All operators are pure column expressions (JVM-side, whole-stage codegen —
no Python in the data path) built from the portable template pairs in
functions.portable, so each has an exact DuckDB oracle. At 100 TB these
are embarrassingly parallel map-only stages: no shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nshm2022db_spark.functions.portable import (
    P,
    duck_ascii_lower,
    duck_char_hash,
    duck_norm_text,
    duck_tokens,
    spark_ascii_lower,
    spark_char_hash,
    spark_norm_text,
    spark_tokens,
)
from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table, spread

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


# Shared quality formula — text_quality_score AND curation_pipeline
# compose the SAME expression; single per-engine builders keep them in
# lockstep (the pipeline previously hand-copied these strings, which
# desyncs silently the first time one side is edited).
def punct_ratio_expr(duck: bool) -> str:
    if duck:
        return (
            "length(regexp_replace(text, '[A-Za-z0-9 \t\n\x0B\f\r]', '', 'g'))::DOUBLE"
            " / greatest(length(text), 1)"
        )
    return (
        "CAST(length(regexp_replace(text, '[A-Za-z0-9 \\\\t\\\\n\\\\x0B\\\\f\\\\r]', '')) AS DOUBLE)"
        " / greatest(length(text), 1)"
    )


def quality_expr(duck: bool) -> str:
    """length-capped × (1 − punct ratio), the cheap quality proxy."""
    if duck:
        return (
            f"least(len({duck_tokens('text')})::DOUBLE / 100.0, 1.0)"
            f" * (1.0 - {punct_ratio_expr(True)})"
        )
    return (
        f"least(CAST(size({spark_tokens('text')}) AS DOUBLE) / 100.0,"
        f" CAST(1.0 AS DOUBLE))"
        f" * (CAST(1.0 AS DOUBLE) - {punct_ratio_expr(False)})"
    )

# word-or-single-punct tokenization, BPE-ish lower bound on token count.
# Two renderings: Spark SQL literals eat one backslash level, DuckDB doesn't.
BPE_PATTERN_SPARK = r"[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"
BPE_PATTERN_DUCK = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "une"),
}


def _norm(col: str, duck: bool) -> str:
    return duck_norm_text(col) if duck else spark_norm_text(col)


_SAMPLE_RATES = {"en": 50, "de": 80, "fr": 20}  # percent kept per stratum
# multiplier < p keeps id*a below 2^63 (same overflow discipline as P)
_SAMPLE_A, _SAMPLE_B = 48_271, 11


def _bucket(expr_id: str) -> str:
    """Deterministic 0-99 bucket from the doc id — an affine hash mod 100,
    identical arithmetic on both engines."""
    return f"((({expr_id} * {_SAMPLE_A} + {_SAMPLE_B}) % {P}) % 100)"


@register(
    "stratified_sample",
    f"""SELECT doc_id, lang FROM documents
       WHERE CASE lang
               WHEN 'en' THEN {_bucket('doc_id')} < {_SAMPLE_RATES['en']}
               WHEN 'de' THEN {_bucket('doc_id')} < {_SAMPLE_RATES['de']}
               WHEN 'fr' THEN {_bucket('doc_id')} < {_SAMPLE_RATES['fr']}
               ELSE FALSE END""",
)
def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling — per-language keep rates via an
    affine-hash bucket of the doc id, NOT `sampleBy`: reproducible across
    runs, engines, and partitionings (rerunning a 100 TB curation job
    must select the same documents), pure filter pushdown, no shuffle."""
    docs = read_table(spark, sf, "documents")
    bucket = F.expr(_bucket("doc_id"))
    keep = F.lit(False)
    for lang, rate in _SAMPLE_RATES.items():
        keep = F.when(F.col("lang") == lang, bucket < rate).otherwise(keep)
    return docs.filter(keep).select("doc_id", "lang")


@register(
    "text_token_stats",
    f"""SELECT doc_id,
               len({duck_tokens('text')}) AS n_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN_DUCK}')) AS n_bpe_tokens,
               ROUND(length(array_to_string({duck_tokens('text')}, ''))::DOUBLE
                     / greatest(len({duck_tokens('text')}), 1), 6) AS avg_token_len
        FROM documents""",
)
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (words or single punctuation marks) + mean token length."""
    toks = spark_tokens("text")
    return read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_PATTERN_SPARK}', 0))").alias("n_bpe_tokens"),
        F.expr(
            f"ROUND(CAST(length(concat_ws('', {toks})) AS DOUBLE)"
            f" / greatest(size({toks}), 1), 6)"
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    f"""SELECT doc_id,
               length(text) AS n_chars_measured,
               ROUND({punct_ratio_expr(True)}, 6) AS punct_ratio,
               ROUND(len(list_filter({duck_tokens('text')}, t -> translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({_STOP_SQL})))::DOUBLE
                     / greatest(len({duck_tokens('text')}), 1), 6) AS stopword_ratio,
               ROUND({quality_expr(True)}, 6) AS quality_score
        FROM documents""",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring from length / punctuation ratio / stopword ratio —
    the standard cheap pre-filters of a training-data pipeline."""
    toks = spark_tokens("text")
    return read_table(spark, sf, "documents").select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.expr(f"ROUND({punct_ratio_expr(False)}, 6)").alias("punct_ratio"),
        F.expr(
            f"ROUND(CAST(size(filter({toks}, t -> " + spark_ascii_lower('t') + f" IN ({_STOP_SQL}))) AS DOUBLE)"
            f" / greatest(size({toks}), 1), 6)"
        ).alias("stopword_ratio"),
        F.expr(f"ROUND({quality_expr(False)}, 6)").alias("quality_score"),
    )


def _votes_spark(toks: str) -> list:
    return [
        F.expr(
            f"size(filter({toks}, t -> translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN "
            f"({', '.join(repr(m) for m in LANG_MARKERS[lang])})))"
        ).alias(f"v_{lang}")
        for lang in LANG_MARKERS
    ]


@register(
    "text_lang_id",
    f"""WITH v AS (
            SELECT doc_id, lang,
                   {', '.join(
                       f"len(list_filter({duck_tokens('text')}, t -> translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN "
                       f"({', '.join(repr(m) for m in LANG_MARKERS[lang])}))) AS v_{lang}"
                       for lang in LANG_MARKERS)}
            FROM documents)
        SELECT doc_id, lang, v_en, v_es, v_de, v_fr,
               CASE WHEN v_en >= v_es AND v_en >= v_de AND v_en >= v_fr THEN 'en'
                    WHEN v_es >= v_de AND v_es >= v_fr THEN 'es'
                    WHEN v_de >= v_fr THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM v""",
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language ID by marker-token voting (n-gram heuristic family) with a
    fixed tie-break order — deterministic, column-only."""
    toks = spark_tokens("text")
    df = read_table(spark, sf, "documents").select(
        "doc_id", "lang", *_votes_spark(toks)
    )
    pred = (
        F.when(
            (F.col("v_en") >= F.col("v_es"))
            & (F.col("v_en") >= F.col("v_de"))
            & (F.col("v_en") >= F.col("v_fr")),
            "en",
        )
        .when((F.col("v_es") >= F.col("v_de")) & (F.col("v_es") >= F.col("v_fr")), "es")
        .when(F.col("v_de") >= F.col("v_fr"), "de")
        .otherwise("fr")
    )
    return df.withColumn("pred_lang", pred)


@register(
    "text_fingerprint",
    f"""SELECT doc_id,
               md5({_norm('text', True)}) AS md5_fp,
               {duck_char_hash(_norm('text', True))} AS rolling_fp
        FROM documents""",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized text plus a
    31-base polynomial rolling hash (mod 1e9+7) — the dedup join keys."""
    norm = _norm("text", False)
    return read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(f"md5({norm})").alias("md5_fp"),
        F.expr(spark_char_hash(norm)).alias("rolling_fp"),
    )


VOCAB_TOP_N = 500


@register(
    "vocab_topk",
    f"""SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({duck_tokens(duck_ascii_lower('text'))}) AS token
              FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT {VOCAB_TOP_N}""",
)
def vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary build — the wordcount that seeds every tokenizer: lower,
    tokenize, explode, count, keep the top {VOCAB_TOP_N}. The shuffle
    carries one row per (token, partition) thanks to map-side partial
    aggregation, and the final ordering plans as TakeOrderedAndProject —
    no global sort of the vocabulary. At 100 TB this is THE canonical
    skewed aggregation ('the' dominates); partial aggs absorb the skew
    before it reaches a reducer."""
    docs = read_table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.expr(spark_tokens(spark_ascii_lower("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_TOP_N)
    )


# -- PII scrubbing ----------------------------------------------------------
# Java regex (Spark) and RE2 (DuckDB) agree on these patterns; DuckDB's
# regexp_replace needs the 'g' flag to match Spark's replace-all default.
EMAIL_RE = r"[A-Za-z0-9.]+@[A-Za-z0-9.]+"
PHONE_RE = r"555-[0-9]{4}"


def _pii_augmented(duck: bool) -> str:
    """Deterministically plant an email + phone per doc (the synthetic
    corpus carries none), so the scrub has real work whose result both
    engines can recompute."""
    if duck:
        return (
            "text || ' contact user' || doc_id::VARCHAR || "
            "'@example.com or 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
        )
    return (
        "concat(text, ' contact user', CAST(doc_id AS STRING), "
        "'@example.com or 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
    )


@register(
    "text_pii_scrub",
    f"""SELECT doc_id,
               md5(regexp_replace(regexp_replace({_pii_augmented(True)},
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5,
               len(regexp_extract_all({_pii_augmented(True)}, '{EMAIL_RE}'))
                   AS n_emails,
               len(regexp_extract_all({_pii_augmented(True)}, '{PHONE_RE}'))
                   AS n_phones
        FROM documents""",
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction — the compliance pass every training corpus makes:
    replace emails/phones with typed placeholders and count what was
    removed. Pure regexp column expressions, map-only, no shuffle; the
    oracle recomputes the scrub so the md5 compare proves byte-identical
    redaction across engines."""
    aug = _pii_augmented(False)
    scrubbed = (
        f"regexp_replace(regexp_replace({aug}, '{EMAIL_RE}', '<EMAIL>'), "
        f"'{PHONE_RE}', '<PHONE>')"
    )
    return read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(f"md5({scrubbed})").alias("scrubbed_md5"),
        F.expr(f"size(regexp_extract_all({aug}, '{EMAIL_RE}', 0))").alias("n_emails"),
        F.expr(f"size(regexp_extract_all({aug}, '{PHONE_RE}', 0))").alias("n_phones"),
    )


# -- repetition stats (Gopher-style quality signals) ------------------------

REP_TOKEN_SHARE = 0.10  # top unigram share above this → repetitive
REP_BIGRAM_SHARE = 0.04


def _max_run_fold(sorted_arr: str) -> str:
    """Spark SQL fold: longest run of equal adjacent elements in a SORTED
    array = the max multiplicity, computed map-side with no shuffle."""
    step = (
        "named_struct('prev', x, "
        "'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1L), "
        "'best', GREATEST(acc.best, "
        "IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1L)))"
    )
    return (
        f"aggregate({sorted_arr}, "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        f"(acc, x) -> {step}, acc -> acc.best)"
    )


@register(
    "text_repetition_stats",
    f"""WITH toks AS (
            SELECT doc_id, {duck_tokens(duck_ascii_lower('text'))} AS t FROM documents),
        uni AS (
            SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n FROM (
                SELECT doc_id, u, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(t) AS u FROM toks)
                GROUP BY doc_id, u) GROUP BY doc_id),
        bi AS (
            SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n FROM (
                SELECT doc_id, b, COUNT(*) AS c
                FROM (SELECT doc_id,
                             unnest(list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i + 1])) AS b
                      FROM toks WHERE len(t) >= 2)
                GROUP BY doc_id, b) GROUP BY doc_id)
        SELECT uni.doc_id,
               ROUND(uni.top_c::DOUBLE / uni.n, 6) AS top_token_share,
               ROUND(bi.top_c::DOUBLE / bi.n, 6) AS top_bigram_share,
               uni.top_c::DOUBLE / uni.n > {REP_TOKEN_SHARE}
                   OR bi.top_c::DOUBLE / bi.n > {REP_BIGRAM_SHARE}
                   AS repetitive
        FROM uni JOIN bi USING (doc_id)""",
)
def text_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family, public):
    share of the most frequent unigram and bigram per document, and a
    repetitive flag. Implemented SHUFFLE-FREE: sort the token array and
    fold for the longest equal-adjacent run (= max multiplicity) — the
    relational unnest/groupBy twin is what the oracle runs, but at 100 TB
    this map-only form never exchanges the corpus. Docs under 2 tokens
    are dropped (no bigram defined), matching the oracle's inner join.

    Staged projections on purpose: the token array is referenced by four
    downstream expressions and `aggregate`/`array_sort` are not cheap, so
    CollapseProject keeps each stage materialized once per row instead of
    inlining (and re-evaluating) the tokenizer ~15x per row — measured
    8.4 s -> well under 1 s at sf0.1."""
    toks = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.expr(spark_tokens(spark_ascii_lower("text"))).alias("tk"))
        .filter("size(tk) >= 2")
    )
    staged = toks.select(
        "doc_id",
        F.expr("size(tk)").alias("n"),
        F.expr("array_sort(tk)").alias("st"),
        F.expr(
            "array_sort(transform(sequence(1, size(tk) - 1), "
            "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1))))"
        ).alias("sb"),
    )
    shares = staged.select(
        "doc_id",
        F.expr(f"CAST({_max_run_fold('st')} AS DOUBLE) / n").alias("u"),
        F.expr(f"CAST({_max_run_fold('sb')} AS DOUBLE) / (n - 1)").alias("b"),
    )
    return shares.select(
        "doc_id",
        F.expr("ROUND(u, 6)").alias("top_token_share"),
        F.expr("ROUND(b, 6)").alias("top_bigram_share"),
        F.expr(f"u > {REP_TOKEN_SHARE} OR b > {REP_BIGRAM_SHARE}").alias("repetitive"),
    )


@register(
    "lm_unigram_score",
    f"""WITH tok AS (
            SELECT doc_id, unnest({duck_tokens(duck_ascii_lower('text'))}) AS token
            FROM documents),
        freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT COUNT(*) AS t FROM tok)
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               ROUND(AVG(-ln(c::DOUBLE / t::DOUBLE)), 4) AS avg_nll
        FROM tok JOIN freq USING (token), tot
        GROUP BY doc_id""",
)
def lm_unigram_score(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram language-model scoring: per document, the mean negative
    log-likelihood of its tokens under the corpus's own unigram
    distribution — the cheap proxy for the KenLM-style perplexity filter
    LLM curation pipelines run (documents whose token mix is improbable
    under the corpus model are boilerplate, tables, or noise). Every
    token appears in the corpus by construction, so no smoothing branch
    is needed; the real pipeline swaps the in-corpus frequencies for a
    reference LM's table, same plan.

    Scale shape: pass 1 aggregates token frequencies — a shuffle whose
    width is the VOCABULARY, not the corpus. The scoring join carries NO
    broadcast hint: the vocabulary is Heaps-law bounded but still grows
    with the corpus, so the join strategy is left to AQE — broadcast at
    driver scales (runtime size stats), token-keyed shuffle at web scale
    (a forced hint is not degradable and would OOM the 8 GB broadcast
    limit first; same hazard class VERDICT r06 #2 / the r6 dedup-family
    de-hinting). Only the 1-row corpus total keeps its hint. The per-doc
    rollup is partial-aggregated on doc_id. AVG is a data-ordered float
    sum, so both sides ROUND(, 4) — the standard discipline.

    The scan is spread (sources.spread, r15): the model-table broadcast
    builds each re-ran the tokenize on the one-file scan's single task.
    The corpus total derives from the vocabulary counts (SUM over freq)
    instead of a third full tokenize pass — same number by definition,
    vocabulary-sized input."""
    tok = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select(
            "doc_id",
            F.explode(F.expr(spark_tokens(spark_ascii_lower("text")))).alias("token"),
        )
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t"))
    return (
        tok.join(freq, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.col("t").cast("double"))), 4
            ).alias("avg_nll"),
        )
    )


BPE_TOP_PAIRS = 50


@register(
    "bpe_pair_counts",
    f"""WITH words AS (
            SELECT w AS word, COUNT(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w),
        pairs AS (
            SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
            FROM words,
                 LATERAL unnest(generate_series(1, length(word) - 1)) AS t(i)
            WHERE length(word) >= 2)
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT {BPE_TOP_PAIRS}""",
)
def bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """The inner loop of BPE tokenizer training: adjacent-symbol pair
    counts over the corpus, weighted by word frequency — exactly the
    statistic a distributed BPE trainer (the tokenizer a 100 TB
    pretraining corpus ships with) maximizes at every merge step. The
    decisive scale property is the TWO-LEVEL aggregation real trainers
    use: pass 1 collapses the corpus to word frequencies (a shuffle
    whose width is the vocabulary, with map-side partial counts), and
    the character-pair explosion then runs over the VOCAB — millions of
    rows — not the trillions of corpus tokens. Top pairs break count
    ties lexicographically, so the result (and `learn_bpe`'s merge
    sequence built on it) is fully deterministic."""
    words = (
        read_table(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge sequence from a corpus, distributed: the
    classic trainer (Sennrich et al. 2016, the construction behind
    GPT-2/LLaMA vocabularies) as iterated Spark aggregations. The
    corpus collapses ONCE to word frequencies; every merge step then
    counts adjacent symbol pairs over the vocab (map-side partial
    sums), picks the max (count desc, pair asc — deterministic ties),
    and applies it with one regexp pass over the vocab's symbol
    strings. Per-step cost is vocab-sized regardless of corpus size —
    the property that makes BPE trainable at 100 TB — and the merge
    list itself is driver-side because it IS the model (kilobytes).
    Lineage is localCheckpoint-bounded every 8 merges so long trainings
    don't grow a 1000-deep plan. Returns the ordered merge rules; stops
    early when no pair reaches ``min_freq``."""
    import re as _re

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat_ws(" ", F.split(F.col("w"), "")).alias("sym"), "freq"
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        arr = F.split(F.col("sym"), " ")
        pairs = (
            vocab.filter(F.size(arr) >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(sym, ' ')) - 1),"
                        " i -> concat_ws(' ',"
                        "   element_at(split(sym, ' '), i),"
                        "   element_at(split(sym, ' '), i + 1)))"
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "pair")
        )
        top = pairs.first()
        if top is None or top["c"] < min_freq:
            break
        a, b = top["pair"].split(" ")
        merges.append((a, b))
        # left-to-right non-overlapping replacement, the reference
        # semantics: pad so every symbol has a space on both sides,
        # match with zero-width boundaries so "a b a b" merges twice
        pat = "(?<= )" + _re.escape(a) + " " + _re.escape(b) + "(?= )"
        vocab = vocab.select(
            F.trim(
                F.regexp_replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    pat,
                    (a + b).replace("\\", "\\\\").replace("$", "\\$"),
                )
            ).alias("sym"),
            "freq",
        )
        if (step + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
    return merges


LM_LAMBDA = 0.75  # bigram weight; 1-λ backs off to the unigram model


@register(
    "lm_bigram_score",
    f"""WITH arr AS (
            SELECT doc_id, {duck_tokens(duck_ascii_lower('text'))} AS ts
            FROM documents),
        big AS (
            SELECT doc_id,
                   ts[CAST(i AS INTEGER)] AS w1,
                   ts[CAST(i + 1 AS INTEGER)] AS w2
            FROM arr, LATERAL unnest(generate_series(1, len(ts) - 1)) AS t(i)
            WHERE len(ts) >= 2),
        c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        tok AS (SELECT unnest(ts) AS w FROM arr),
        c1 AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT COUNT(*) AS t FROM tok)
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln(
                   {LM_LAMBDA} * c12::DOUBLE / u1.c::DOUBLE
                   + {1 - LM_LAMBDA} * u2.c::DOUBLE / t::DOUBLE)), 4)
                   AS avg_nll
        FROM big
        JOIN c2 USING (w1, w2)
        JOIN c1 u1 ON u1.w = big.w1
        JOIN c1 u2 ON u2.w = big.w2, tot
        GROUP BY doc_id""",
)
def lm_bigram_score(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated bigram language-model scoring — the next rung above
    `lm_unigram_score` on the KenLM-style perplexity-filter ladder: per
    document, the mean negative log-likelihood of its token bigrams
    under λ·P(w2|w1) + (1-λ)·P(w2), the classic Jelinek-Mercer
    interpolation (every bigram in scope appears in the corpus model,
    so the backoff weight is a smoothing choice, not a zero-guard).

    Scale shape: the bigram explode is map-side; the bigram count table
    is ONE shuffle whose width is the observed-bigram vocabulary. The
    model-table joins carry NO broadcast hints (VERDICT r06 #2): the
    observed-bigram table grows with the corpus — much faster than the
    unigram vocab — so a forced hint would OOM the driver or hit the
    8 GB broadcast limit at 100× scale, and an explicit hint is not
    AQE-degradable. Hint-free, AQE broadcasts at driver scales from
    runtime size stats and falls back to (w1,w2)- / w-keyed shuffle
    joins at web scale. Only the 1-row corpus total keeps its hint;
    the per-doc rollup partial-aggregates on doc_id. AVG is a
    data-ordered float sum → ROUND(,4) both sides.

    The scan is spread (sources.spread, r15 — profiled: the three
    model broadcast builds re-ran the tokenize serially on the
    one-file scan's single task, 1.7+2.0+0.6 s at sf0.1); the corpus
    total derives from the unigram counts (SUM over c1) instead of a
    third tokenize pass."""
    arr = spread(
        read_table(spark, sf, "documents").select("doc_id", "text")
    ).select(
        "doc_id",
        F.expr(spark_tokens(spark_ascii_lower("text"))).alias("ts"),
    )
    big = (
        arr.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS w1,"
                    "             element_at(ts, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    tok = arr.select(F.explode("ts").alias("w"))
    c1 = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = c1.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t"))
    p = (
        F.lit(LM_LAMBDA) * F.col("c12").cast("double") / F.col("cw1").cast("double")
        + F.lit(1 - LM_LAMBDA) * F.col("cw2").cast("double") / F.col("t").cast("double")
    )
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1.select(F.col("w").alias("w1"), F.col("c").alias("cw1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("cw2")), "w2")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("avg_nll"),
        )
    )


# Fixed BPE merge table for the encode demo, applied IN ORDER (order is
# semantic: "er"+"s" can only fire after "e"+"r"). A production pipeline
# feeds learn_bpe's output here; fixing the table keeps the oracle static.
BPE_FIXED_MERGES = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("s", "t"),
    ("er", "s"), ("a", "n"), ("t", "h"), ("in", "g"),
]
BPE_ENCODE_TOPK = 20


def _bpe_sym_sql(col: str, duck: bool) -> str:
    """Marker-framed symbol string of a word (chr(1) around every symbol,
    chr(1)chr(1) between), with the fixed merges applied as chained
    non-overlapping left-to-right replace() — identical builtin
    semantics on both engines, and the markers make merge boundaries
    exact (no symbol can match inside another)."""
    m = "chr(1)"
    if duck:
        s = f"({m} || array_to_string(string_split({col}, ''), {m}||{m}) || {m})"
        for a, b in BPE_FIXED_MERGES:
            s = (
                f"replace({s}, {m}||'{a}'||{m}||{m}||'{b}'||{m},"
                f" {m}||'{a}{b}'||{m})"
            )
    else:
        s = f"concat({m}, array_join(split({col}, ''), concat({m}, {m})), {m})"
        for a, b in BPE_FIXED_MERGES:
            s = (
                f"replace({s}, concat({m},'{a}',{m},{m},'{b}',{m}),"
                f" concat({m},'{a}{b}',{m}))"
            )
    return s


@register(
    "bpe_encode_topk",
    f"""WITH words AS (
            SELECT w AS word, COUNT(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w),
        toks AS (
            SELECT unnest(string_split(
                       trim({_bpe_sym_sql('word', True)}, chr(1)),
                       chr(1) || chr(1))) AS token,
                   freq
            FROM words)
        SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM toks GROUP BY token
        ORDER BY cnt DESC, token LIMIT {BPE_ENCODE_TOPK}""",
)
def bpe_encode_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BPE ENCODING applied distributed — the other half of the
    tokenizer story beside `bpe_pair_counts`/`learn_bpe`: every word is
    segmented by a fixed ordered merge table (chained non-overlapping
    replace over a marker-framed symbol string — builtin string ops,
    whole-stage codegen, no Python), and the corpus's resulting token
    frequencies roll up to the top {BPE_ENCODE_TOPK}. The decisive
    scale property mirrors training: encoding runs over the DISTINCT
    WORD table (vocabulary-sized) and corpus-weights by word frequency,
    so the per-token cost is paid once per unique word, not once per
    corpus occurrence — exactly how production tokenizer services
    cache. Ties break lexicographically; fully deterministic."""
    words = (
        read_table(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    toks = words.select(
        F.explode(
            F.expr(
                f"split(trim(BOTH chr(1) FROM {_bpe_sym_sql('word', False)}),"
                f" concat(chr(1), chr(1)))"
            )
        ).alias("token"),
        "freq",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(BPE_ENCODE_TOPK)
    )


BPE_LEARN_MERGES = 6  # merges the learned-encoder demo trains end-to-end


def _bpe_learned_oracle(n_merges: int, topk: int) -> str:
    """DuckDB replica of `learn_bpe` + encode, UNROLLED: each merge
    step is one CTE pair (argmax pair by weighted count, ties count
    desc then 'a b' asc — learn_bpe's exact order — then one chained
    marker-framed replace over the vocab). The oracle therefore learns
    the same data-dependent merge table the Spark side does, at any
    scale factor, without the query embedding learned strings."""
    m = "chr(1)"
    mm = f"{m} || {m}"
    sql = [
        f"""WITH words AS (
            SELECT w AS word, COUNT(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w),
        v0 AS (
            SELECT {m} || array_to_string(string_split(word, ''), {mm})
                       || {m} AS sym,
                   freq
            FROM words)"""
    ]
    for k in range(1, n_merges + 1):
        sql.append(
            f""",
        p{k} AS (
            SELECT syms[CAST(i AS INTEGER)] AS a,
                   syms[CAST(i + 1 AS INTEGER)] AS b,
                   freq
            FROM (SELECT string_split(trim(sym, chr(1)), {mm}) AS syms,
                         freq
                  FROM v{k - 1}),
                 LATERAL unnest(generate_series(1, len(syms) - 1)) AS t(i)
            WHERE len(syms) >= 2),
        m{k} AS (
            SELECT a, b FROM p{k} GROUP BY a, b
            ORDER BY SUM(freq) DESC, a || ' ' || b LIMIT 1),
        v{k} AS (
            -- LEFT JOIN ON TRUE: when the corpus exhausts mergeable
            -- pairs before step {k}, m{k} is EMPTY — a cross join would
            -- empty the whole vocab, while learn_bpe just stops early
            -- and the Spark side still encodes (ADVICE r08). NULL a/b
            -- makes the step a pass-through instead.
            SELECT CASE WHEN a IS NULL THEN sym
                        ELSE replace(sym, {m} || a || {mm} || b || {m},
                                     {m} || a || b || {m}) END AS sym,
                   freq
            FROM v{k - 1} LEFT JOIN m{k} ON TRUE)"""
        )
    sql.append(
        f"""
        SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(trim(sym, chr(1)), {mm})) AS token,
                     freq
              FROM v{n_merges})
        GROUP BY token ORDER BY cnt DESC, token LIMIT {topk}"""
    )
    return "".join(sql)


@register(
    "bpe_encode_learned",
    _bpe_learned_oracle(BPE_LEARN_MERGES, BPE_ENCODE_TOPK),
)
def bpe_encode_learned(spark: SparkSession, sf: str) -> DataFrame:
    """The tokenizer story END-TO-END (VERDICT r07 #5, closing r06 #6):
    `learn_bpe` trains {BPE_LEARN_MERGES} merges on the corpus
    (iterated vocab-sized Spark aggregations), and the chained-replace
    encoder then segments the corpus with the LEARNED table — the
    `bpe_encode_topk` machinery parameterized over `learn_bpe`'s output
    instead of a fixed demo table. Learned symbols are applied as
    Column literals (F.replace), never spliced into SQL text, so
    corpus-controlled tokens cannot inject. The oracle re-learns the
    merges itself (unrolled argmax+replace CTE per step), so Spark and
    DuckDB must agree on every tie-break of training AND the final
    segmentation — a far stronger parity check than encoding alone.
    Scale shape: training cost is per-merge vocab-sized (the property
    that makes BPE trainable over 100 TB), encoding runs once per
    DISTINCT word and corpus-weights by frequency."""
    docs = read_table(spark, sf, "documents")
    merges = learn_bpe(spark, docs, BPE_LEARN_MERGES, min_freq=1)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    mark = "\x01"
    sym = F.concat(
        F.lit(mark), F.array_join(F.split("word", ""), mark + mark), F.lit(mark)
    )
    for a, b in merges:
        sym = F.replace(
            sym,
            F.lit(mark + a + mark + mark + b + mark),
            F.lit(mark + a + b + mark),
        )
    toks = words.select(
        F.explode(F.split(F.btrim(sym, F.lit(mark)), mark + mark)).alias(
            "token"
        ),
        "freq",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(BPE_ENCODE_TOPK)
    )


ASSOC_MIN_C = 5  # bigram support floor for the association table


@register(
    "lm_bigram_assoc",
    f"""WITH arr AS (
            SELECT doc_id, {duck_tokens(duck_ascii_lower('text'))} AS ts
            FROM documents),
        big AS (
            SELECT ts[CAST(i AS INTEGER)] AS w1,
                   ts[CAST(i + 1 AS INTEGER)] AS w2
            FROM arr, LATERAL unnest(generate_series(1, len(ts) - 1)) AS t(i)
            WHERE len(ts) >= 2),
        c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        tok AS (SELECT unnest(ts) AS w FROM arr),
        c1 AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT COUNT(*) AS t FROM tok)
        SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
               ROUND(ln(c12::DOUBLE * t::DOUBLE
                        / (u1.c::DOUBLE * u2.c::DOUBLE)), 4) AS pmi
        FROM c2
        JOIN c1 u1 ON u1.w = c2.w1
        JOIN c1 u2 ON u2.w = c2.w2, tot
        WHERE c12 >= {ASSOC_MIN_C}""",
)
def lm_bigram_assoc(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise mutual information over corpus bigrams — the
    collocation/association table beside the `lm_bigram_score`
    perplexity rung: PMI = ln(P(w1,w2) / (P(w1)·P(w2))) for every
    bigram with support ≥ {ASSOC_MIN_C}, the statistic phrase-mining
    and stop-phrase curation key on. The integer support floor (not a
    float top-k) keeps row selection engine-exact; PMI itself is a log
    of a ratio of exact counts, ROUND(,4) on both sides.

    Scale shape: unlike scoring there is NO join back to per-occurrence
    rows — both join sides are model tables (observed bigrams × unigram
    vocab), hint-free so AQE broadcasts the vocab at small scale and
    degrades to key-shuffled joins at web scale; the 1-row corpus total
    is the only broadcast-pinned relation.

    The corpus total derives from the unigram counts instead of a
    third tokenize pass (r15). The scan is NOT spread: probed both
    ways (interleaved A/B, 3 rounds) — unlike lm_bigram_score, the
    model×model join shape overlaps its broadcast builds, and the
    spread measured flat-to-slightly-worse, so it stays pinned
    spread-free (the sources.spread discipline: apply only where
    measured)."""
    arr = read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(spark_tokens(spark_ascii_lower("text"))).alias("ts"),
    )
    big = (
        arr.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS w1,"
                    "             element_at(ts, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= ASSOC_MIN_C)
    )
    tok = arr.select(F.explode("ts").alias("w"))
    c1 = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = c1.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t"))
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("t").cast("double")
        / (F.col("cw1").cast("double") * F.col("cw2").cast("double"))
    )
    return (
        c2.join(c1.select(F.col("w").alias("w1"), F.col("c").alias("cw1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("cw2")), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(pmi, 4).alias("pmi"),
        )
    )


NOVELTY_GRAM = 5  # token-gram width for the novelty metric


@register(
    "text_novelty_score",
    f"""WITH arr AS (
            SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        grams AS (
            SELECT doc_id,
                   array_to_string(
                       a[CAST(i AS INTEGER):
                         CAST(i + {NOVELTY_GRAM - 1} AS INTEGER)], ' ')
                       AS gram
            FROM arr,
                 LATERAL unnest(
                     generate_series(1, len(a) - {NOVELTY_GRAM - 1})) AS t(i)),
        df AS (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd
            FROM grams GROUP BY gram)
        SELECT doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel,
               ROUND(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END)::DOUBLE
                     / COUNT(*), 6) AS novelty
        FROM grams JOIN df USING (gram)
        GROUP BY doc_id""",
)
def text_novelty_score(spark: SparkSession, sf: str) -> DataFrame:
    """Gram-novelty scoring — the curation twin of the substring-run
    dedup: per document, the fraction of its {NOVELTY_GRAM}-gram
    positions whose gram appears in NO other document. Low novelty
    means boilerplate or near-copies (downweight or drop); the same
    statistic, inverted, is the memorization-risk signal training-data
    analyses report. Scale shape matches `dedup_substring_runs`: a
    map-side positional gram explode, ONE gram-keyed shuffle for
    document frequency, a join back, and a doc-keyed rollup — gram
    text as the key keeps the DuckDB oracle byte-identical (a 100 TB
    run would hash it). The gram explode is the measured hot path and
    runs pre-exchange, so the scan is spread (sources.spread: the
    one-file testdata scan is one partition; r14, 1.6x)."""
    grams = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.split("text", " ").alias("a"))
        .filter(F.size("a") >= NOVELTY_GRAM)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(a) - {NOVELTY_GRAM - 1}),"
                    f" i -> concat_ws(' ', slice(a, i, {NOVELTY_GRAM})))"
                )
            ).alias("gram"),
        )
    )
    df_t = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    novel = (F.col("nd") == 1).cast("long")
    return (
        grams.join(df_t, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


# Winnowing geometry: k-token grams hashed, windows of WINNOW_W
# consecutive gram hashes, rightmost-minimum selected per window
# (Schleimer/Wilkerson/Aiken 2003 "robust winnowing" — the MOSS
# fingerprint selector). POS_BITS bounds document length (2^21 gram
# positions); the (hash, rightmost-pos) pair packs into one BIGINT so
# both engines pick identical fingerprints with plain MIN.
WINNOW_K = 3
WINNOW_W = 4
_POS_BITS = 21
_POS_CAP = 1 << _POS_BITS


def _winnow_key(h: str, pos: str) -> str:
    """Encode (hash asc, pos desc) into one orderable BIGINT: the MIN
    key in a window is the smallest hash, ties to the RIGHTMOST
    position — robust winnowing's tie rule, which keeps the selected
    set consistent across overlapping windows."""
    return f"({h} * {_POS_CAP} + ({_POS_CAP - 1} - {pos}))"


@register(
    "text_winnow_fingerprints",
    f"""WITH arr AS (
            SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        grams AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   {duck_char_hash("array_to_string(a[CAST(i AS INTEGER):CAST(i + WK AS INTEGER)], ' ')")} AS h
            FROM (SELECT doc_id, a, {WINNOW_K - 1} AS WK FROM arr),
                 LATERAL unnest(
                     generate_series(1, len(a) - {WINNOW_K - 1})) AS t(i)),
        keys AS (
            SELECT doc_id, pos, {_winnow_key('h', 'pos')} AS key,
                   COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
            FROM grams),
        wins AS (
            SELECT doc_id, n_grams,
                   MIN(key) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
                   ) AS sel,
                   pos
            FROM keys),
        fps AS (
            SELECT DISTINCT doc_id, n_grams, sel
            FROM wins
            WHERE pos <= greatest(n_grams - {WINNOW_W - 1}, 1)),
        dec AS (
            SELECT doc_id, n_grams, sel // {_POS_CAP} AS h FROM fps)
        SELECT doc_id,
               CAST(MAX(n_grams) AS BIGINT) AS n_grams,
               COUNT(*) AS n_fp,
               CAST(SUM(h) % {P} AS BIGINT) AS fp_checksum
        FROM dec GROUP BY doc_id""",
)
def text_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """WINNOWING document fingerprints — the MOSS selection algorithm
    (Schleimer et al. 2003): hash every {WINNOW_K}-token gram, slide a
    window of {WINNOW_W} hashes, keep each window's minimum (ties to
    the rightmost), and the DISTINCT selected set is the document's
    fingerprint — guaranteed to share a fingerprint with any document
    it shares a {WINNOW_K + WINNOW_W - 1}-token substring with, at
    ~2/(w+1) the density of full gram sets. This is the principled
    sub-sampling the substring-run dedup scales with: index
    fingerprints instead of every gram, same detection guarantee.

    Scale shape: gram hashing is map-side (portable char-hash fold, so
    the DuckDB oracle is bit-identical); the window MIN runs on ONE
    doc-keyed shuffle that the distinct and final rollup reuse (same
    partitioning, no second exchange); the (hash, rightmost-pos) pair
    packs into one BIGINT so the window needs plain MIN, not a struct
    argmin. Gram hashing runs pre-exchange on the scan partition, so
    the scan is spread (sources.spread; r14, 2x)."""
    k1 = WINNOW_K - 1
    grams = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.split("text", " ").alias("a"))
        .filter(F.size("a") >= WINNOW_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(a) - {k1}),"
                    f" i -> concat_ws(' ', slice(a, i, {WINNOW_K})))"
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.expr(spark_char_hash("gram")).alias("h"),
        )
    )
    wd = Window.partitionBy("doc_id")
    wf = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    keys = grams.select(
        "doc_id",
        "pos",
        F.expr(_winnow_key("h", "pos")).alias("key"),
    ).withColumn("n_grams", F.count(F.lit(1)).over(wd))
    fps = (
        keys.withColumn("sel", F.min("key").over(wf))
        # short docs (fewer grams than one window) still get ONE
        # fingerprint — the min over all their grams — instead of
        # silently vanishing from the index (greatest(..., 1) keeps the
        # pos=1 row, whose trailing frame covers every gram present)
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n_grams") - (WINNOW_W - 1), F.lit(1))
        )
        .select("doc_id", "n_grams", "sel")
        .distinct()
    )
    return (
        fps.select(
            "doc_id", "n_grams", (F.col("sel") / _POS_CAP).cast("long").alias("h")
        )
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.count(F.lit(1)).alias("n_fp"),
            (F.sum("h") % P).cast("long").alias("fp_checksum"),
        )
    )
