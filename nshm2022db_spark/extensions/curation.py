"""Corpus-curation operators: the selection/packing/search steps of a
training-data pipeline that sit between raw ingest and tokenization —
relevance search (TF-IDF), benchmark decontamination, weighted and
mixture-controlled subsampling, and context-window sequence packing.

All determinism comes from the portable arithmetic in functions.portable
(polynomial hashes, affine pseudo-randomness, fixed-order float sums), so
every operator has an exact DuckDB oracle and — run twice on any cluster
with any partitioning — selects the same rows. That reproducibility is
the point: a 100 TB curation job must be re-runnable and auditable.

Scale shapes (per operator, details in each docstring):
  * tfidf_search      — map-side tf, one 1-row broadcast of corpus stats,
                        TakeOrderedAndProject top-k; no wide shuffle.
  * decontaminate     — shingle inverted index vs a BROADCAST benchmark
                        set; one partial-aggregated count shuffle.
  * weighted_sample   — map-only exponential race keys + global top-k.
  * pack_sequences    — one shuffle on the stream key shared by the
                        window and the rollup.
  * source_mix_sample — one shuffle on the mixture key (row_number).
  * curation_pipeline — the composed pass (quality → dedup → sample):
                        still ONE job with ONE exchange.
  * chunk_documents   — map-only sliding-window chunking (explode inside
                        the scan stage, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nshm2022db_spark.functions.portable import (
    duck_ascii_lower,
    duck_char_hash,
    duck_dot,
    duck_norm_text,
    spark_ascii_lower,
    spark_char_hash,
    spark_dot,
    spark_norm_text,
    P,
    duck_shingle_hashes,
    duck_token_hashes,
    duck_tokens,
    spark_shingle_hashes,
    spark_token_hashes,
    spark_tokens,
)
from nshm2022db_spark.registry import register
from nshm2022db_spark.sources import read_table, spread

# ---------------------------------------------------------------------------
# TF-IDF relevance search
# ---------------------------------------------------------------------------

TFIDF_TERMS = ("spark", "vector", "merge")
TFIDF_K = 50


def _tf(term: str, duck: bool) -> str:
    toks = duck_tokens(duck_ascii_lower("text")) if duck else "tk"
    fn = "len(list_filter" if duck else "size(filter"
    return f"{fn}({toks}, t -> t = '{term}'))"


def _score(n: str, prefix: str, duck: bool) -> str:
    """Σ_i tf_i · ln(1 + N/df_i) written out term-by-term in FIXED order —
    the same three products added in the same sequence on both engines, so
    the double result is reproducible (no data-ordered SUM)."""
    parts = [
        f"CAST({prefix}tf{i} AS DOUBLE) * ln(1.0 + CAST({n} AS DOUBLE) / "
        f"CAST(greatest({prefix}df{i}, 1) AS DOUBLE))"
        for i in range(len(TFIDF_TERMS))
    ]
    return " + ".join(parts)


_TFIDF_ORACLE = f"""
    WITH tf AS (
        SELECT doc_id,
               {', '.join(f"{_tf(w, True)} AS tf{i}" for i, w in enumerate(TFIDF_TERMS))}
        FROM documents),
    stats AS (
        SELECT COUNT(*) AS n,
               {', '.join(f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                          for i in range(len(TFIDF_TERMS)))}
        FROM tf)
    SELECT doc_id,
           {', '.join(f"tf{i}" for i in range(len(TFIDF_TERMS)))},
           ROUND({_score('n', '', True)}, 6) AS tfidf_score
    FROM tf, stats
    WHERE {_score('n', '', True)} > 0
    ORDER BY {_score('n', '', True)} DESC, doc_id
    LIMIT {TFIDF_K}
"""


@register("tfidf_search", _TFIDF_ORACLE)
def tfidf_search(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k documents by TF-IDF for a fixed query-term set.

    Spark-first shape: term frequencies are computed MAP-SIDE per document
    (array filter on the token array — no explode, no (doc, term) shuffle);
    the corpus statistics (N, per-term document frequency) are ONE 1-row
    aggregate broadcast back over the scan; the top-k plans as
    TakeOrderedAndProject. Two narrow passes over the corpus and a k-row
    result — no wide exchange anywhere, at any corpus size.

    The reference's query surface is filter/join relevance (SURVEY §2.2);
    scoring search is the training-pipeline generalization."""
    tf_cols = [
        F.expr(_tf(w, False)).alias(f"tf{i}") for i, w in enumerate(TFIDF_TERMS)
    ]
    tf = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.expr(spark_tokens(spark_ascii_lower("text"))).alias("tk"))
        .select("doc_id", *tf_cols)
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(TFIDF_TERMS))
        ],
    )
    scored = tf.join(F.broadcast(stats)).select(
        "doc_id",
        *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
        F.expr(_score("n", "", False)).alias("_score"),
    )
    return (
        scored.filter(F.col("_score") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(TFIDF_K)
        .select(
            "doc_id",
            *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
            F.expr("ROUND(_score, 6)").alias("tfidf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Incrementally-maintained inverted index (postings + df as lakehouse tables)
# ---------------------------------------------------------------------------

IDX_DELTA_MOD = 5  # doc_id % 5 == 0 plays the freshly-crawled delta batch
IDX_BUCKETS = 8  # term-hash partition buckets of the postings/df tables


def _index_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl, bucket) postings of a documents frame —
    token counts per (doc, term) over the lowercased whitespace tokens,
    keyed into the term-hash bucket the index tables partition by.

    ``dl`` is the document's TOTAL token count denormalized onto every
    posting row (Lucene's per-doc norms, stored with the postings): a
    length-normalized scorer (BM25) then gets dl straight out of the
    term's point probe — no doc-keyed length join at query time, which
    at 100 TB would shuffle a candidate set against a corpus-sized
    lengths table per query. Cost: 8 bytes/posting and one extra
    doc-keyed exchange at BUILD time (the window below), paid once per
    ingest batch instead of once per query."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(spark_tokens(spark_ascii_lower("text")))).alias("term"),
    )
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("long")
        )
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(IDX_BUCKETS)))
    )


def _index_meta_rows(spark: SparkSession, docs: DataFrame, bpost: DataFrame):
    """The corpus-statistics rows a scorer needs from the meta table:
    ``n_docs`` (ALL docs, including token-less ones — they carry 0
    toward sum_dl but do count toward N/avgdl) and ``sum_dl`` (total
    token count, summed off the already-persisted postings so the
    corpus is not re-tokenized). Both are additive under the
    ``v = s.v + t.v`` meta merge, so per-batch rows accumulate to the
    exact corpus totals."""
    total = bpost.agg(F.sum("tf").cast("long").alias("t")).collect()[0]["t"]
    return spark.createDataFrame(
        [("n_docs", docs.count(), 0), ("sum_dl", total or 0, 0)],
        "metric string, v long, pk int",
    )


def _index_df_counts(post: DataFrame) -> DataFrame:
    """(term, df, bucket) per-term document frequencies of a postings
    frame (postings only hold tf > 0, so a row count per term IS df)."""
    return (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(IDX_BUCKETS)))
    )


def _tfidf_probe_index(
    spark: SparkSession, post_dir: str, df_dir: str, meta_dir: str
) -> DataFrame:
    """The query side shared by every index variant: three bloom-pruned
    point probes into the postings, the 3-row df probe + 1-row N frame
    broadcast, tfidf_search's exact scoring/order/limit."""
    from nshm2022db_spark.streaming.sinks import read_keyed_table

    probes = [
        read_keyed_table(spark, post_dir, prune={"term": ("eq", t)}).filter(
            F.col("term") == t
        )
        for t in TFIDF_TERMS
    ]
    post = probes[0]
    for p in probes[1:]:
        post = post.unionByName(p)
    tfw = post.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf{i}")
            for i, t in enumerate(TFIDF_TERMS)
        ]
    )
    dprobes = [
        read_keyed_table(spark, df_dir, prune={"term": ("eq", t)}).filter(
            F.col("term") == t
        )
        for t in TFIDF_TERMS
    ]
    dfr = dprobes[0]
    for p in dprobes[1:]:
        dfr = dfr.unionByName(p)
    # SUM, not MAX: the df/meta tables may hold one MERGED row per key
    # (the batch-incremental path) or one DELTA row per micro-batch
    # (the streaming path's MOR-counter appends, r14) — the additive
    # fold is exact for both shapes (integer sums)
    df_row = dfr.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("df"))), F.lit(0)
            ).alias(f"df{i}")
            for i, t in enumerate(TFIDF_TERMS)
        ]
    )
    n_row = read_keyed_table(spark, meta_dir).agg(
        F.sum(F.when(F.col("metric") == "n_docs", F.col("v"))).alias("n")
    )
    stats = df_row.crossJoin(n_row)
    scored = tfw.join(F.broadcast(stats)).select(
        "doc_id",
        *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
        F.expr(_score("n", "", False)).alias("_score"),
    )
    return (
        scored.filter(F.col("_score") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(TFIDF_K)
        .select(
            "doc_id",
            *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
            F.expr("ROUND(_score, 6)").alias("tfidf_score"),
        )
    )


@register("tfidf_index_incremental", _TFIDF_ORACLE)
def tfidf_index_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """tfidf_search answered from a MATERIALIZED inverted index that is
    maintained INCREMENTALLY — the 100 TB search story: you cannot
    re-scan the corpus per query (tfidf_search's two narrow passes are
    fine per query only while the corpus fits a scan budget) nor
    rebuild the index per ingest batch. Three lakehouse tables,
    partitioned by a term-hash bucket:

    * ``postings`` (term, doc_id, tf) — built once over the base corpus
      (doc_id % {IDX_DELTA_MOD} != 0), then the delta batch MERGEs in
      as pure inserts (O(batch tokens), appended generations — no
      rewrite);
    * ``df`` (term, df) — the delta's per-term doc counts MERGE with an
      ADDITIVE update (``df = s.df + t.df``), the arithmetic-merge
      pattern a statistics sidecar needs (new terms insert);
    * ``meta`` (metric, v) — corpus size N, merged additively the same
      way.

    All five commits carry a fixed ``batch_id``, so a concurrent or
    crashed-and-retried build no-ops instead of double-counting — the
    foreachBatch idempotence contract reused as build idempotence.

    The query side is three POINT PROBES into the index: each term
    reads the postings through an ``("eq", term)`` prune (manifest
    stats + term Blooms drop every partition but the term's bucket;
    merge-appended generations are stat-less until compaction and
    always read — safe, just unpruned), pivots to per-doc tf columns,
    and joins the 1-row broadcast stats frame (df/N). Scoring, ordering
    and the oracle are tfidf_search's verbatim — maintaining the index
    incrementally must not move a single score."""
    import os as _os

    from nshm2022db_spark.sources.scratch import (
        is_landed,
        mark_landed,
        scratch_path,
    )
    from nshm2022db_spark.streaming.sinks import (
        append_partition_transaction,
        compact_partition_table,
        merge_into_table,
        read_keyed_table,
    )

    # r14 key bump: the index schema gained per-posting dl + the sum_dl
    # meta metric (BM25's length stats); an r13 landing lacks them
    # r15 key bump: the bloom sidecar FORMAT changed (signed-zero
    # canonicalization + version stamp); an r14 landing's legacy blooms
    # would read as no-bloom and silently lose point-probe pruning
    base = scratch_path("tfidf_index_r15", sf)
    post_dir = _os.path.join(base, "postings")
    df_dir = _os.path.join(base, "df")
    meta_dir = _os.path.join(base, "meta")
    is_delta = F.col("doc_id") % IDX_DELTA_MOD == 0
    postings, df_counts = _index_postings, _index_df_counts

    if not is_landed(base):
        docs = read_table(spark, sf, "documents")
        # one tokenize pass per half: the postings append and the df
        # rollup both consume the persisted frame (review-sweep fix —
        # the unpersisted form re-tokenized the corpus per consumer)
        bpost = postings(docs.filter(~is_delta)).persist()
        append_partition_transaction(
            spark, post_dir, "bucket", bpost,
            stats_cols=["doc_id"], bloom_cols=["term"], batch_id=0,
            n_partition_values=IDX_BUCKETS,
        )
        append_partition_transaction(
            spark, df_dir, "bucket", df_counts(bpost),
            bloom_cols=["term"], batch_id=0,
            n_partition_values=IDX_BUCKETS,
        )
        meta0 = _index_meta_rows(spark, docs.filter(~is_delta), bpost)
        # pk is a single constant value: n_partition_values=1 skips the
        # distribution shuffle a 2-row frame would otherwise pay
        # (ADVICE r15 #2)
        append_partition_transaction(
            spark, meta_dir, "pk", meta0, batch_id=0, n_partition_values=1
        )
        bpost.unpersist()

        dpost = postings(docs.filter(is_delta)).persist()
        # change_data=False on every index merge: nothing consumes the
        # index tables' CDC feed (probes read the tables directly), and
        # the sidecar write costs a flat ~0.4 s per commit (PERF.md r14)
        merge_into_table(
            spark, post_dir, dpost, keys=["term", "doc_id"],
            when_not_matched_insert=True, batch_id=1, change_data=False,
        )
        merge_into_table(
            spark, df_dir, df_counts(dpost), keys=["term"],
            when_matched_update={"df": "s.df + t.df"},
            when_not_matched_insert=True, batch_id=1, change_data=False,
        )
        metad = _index_meta_rows(spark, docs.filter(is_delta), dpost)
        merge_into_table(
            spark, meta_dir, metad, keys=["metric"],
            when_matched_update={"v": "s.v + t.v"},
            when_not_matched_insert=True, batch_id=1, change_data=False,
        )
        dpost.unpersist()
        # OPTIMIZE after ingest: the merge APPENDED generations to every
        # touched bucket, and extended entries drop their stats/blooms
        # (stat-less = never pruned = safe) — compaction rewrites them
        # and RECOMPUTES both, so the point probes below prune again.
        # This is the maintenance rhythm of a real inverted index:
        # cheap stat-less appends per batch, periodic compaction to
        # restore skipping (pinned by test_point_probe_prunes_buckets).
        compact_partition_table(
            spark, post_dir, max_files_per_partition=1,
            stats_cols=["doc_id"], bloom_cols=["term"],
        )
        compact_partition_table(
            spark, df_dir, max_files_per_partition=1, bloom_cols=["term"]
        )
        mark_landed(base)

    return _tfidf_probe_index(spark, post_dir, df_dir, meta_dir)


def _index_apply_batch(
    batch_df: DataFrame, batch_id: int, post_dir: str, df_dir: str, meta_dir: str
) -> None:
    """One micro-batch's index delta as three idempotent commits —
    module-level (not a closure) so the crash-replay test can drive it
    directly. One tokenize pass feeds all three: the postings append
    and the df rollup both consume the persisted bpost, and N counts
    the batch's rows.

    EVERYTHING appends, nothing merges (r14; postings since r13): each
    document arrives in exactly one micro-batch, so posting keys are
    new by construction, and the df/meta COUNTERS land as additive
    delta generations the probes SUM-fold — the Hudi-MOR trade for
    streaming counters, O(batch) per commit where the additive MERGE
    paid an O(index) decision scan per batch (measured ~3 s/batch at
    sf0.1; the r13 postings note, generalized). Re-delivery of a whole
    batch is the one duplication mode left, and batch_id no-ops each
    target table's commit from its OWN ledger — a crash between the
    three commits replays only the missing ones, and appends are
    restart-safe on EMPTY tables too, which retires the
    merge-into-empty-raises restart hazard the old per-target
    version-0 branch existed for (still pinned by
    test_crash_replay_of_first_batch_noops_cleanly)."""
    from pyspark.sql import Observation

    from nshm2022db_spark.streaming.sinks import append_partition_transaction

    def _obs_bounded(obs, timeout_s: float = 120.0):
        """The observation's metrics dict, waiting at most
        ``timeout_s`` — or None so the caller recomputes (the
        unbounded `obs.get` blocks forever when the observed plan
        never ran). Polls the JVM's non-blocking accessor; the final
        `.get` is then immediate."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        while True:
            if obs._jo is not None and obs._jo.getRowOrEmpty().isDefined():
                return obs.get
            if _time.monotonic() >= deadline:
                return None
            _time.sleep(0.05)

    s = batch_df.sparkSession
    # batch_df is persisted too: the meta scalars are further consumers
    # of it, and without the persist the micro-batch SOURCE would be
    # re-read once per batch (ADVICE r13).
    obs_docs, obs_dl = Observation(), Observation()
    # the meta scalars (n_docs, sum_dl) RIDE the postings stage write as
    # observed metrics (r15, guide §1) — the old explicit count() +
    # agg().collect() paid two extra jobs per micro-batch for numbers
    # an already-running action computes in passing
    batch_df = batch_df.observe(
        obs_docs, F.count(F.lit(1)).alias("n")
    ).persist()
    bpost = (
        _index_postings(batch_df)
        .observe(obs_dl, F.sum("tf").cast("long").alias("t"))
        .persist()
    )
    try:
        # the hot-path commits are STAT-APPENDS ONLY — no per-batch term
        # blooms (r15): every caller runs compact_partition_table with
        # bloom_cols at the end of the stream, which rewrites the
        # fragmented buckets and recomputes blooms anyway, so the
        # per-batch bloom aggregation (one Spark job per bloomed commit)
        # bought pruning nothing ever probed. Bloom-less = never pruned
        # = always read — correctness unchanged, the Hudi rhythm: cheap
        # appends per batch, compaction restores skipping.
        written = append_partition_transaction(
            s, post_dir, "bucket", bpost,
            stats_cols=["doc_id"], batch_id=batch_id,
            n_partition_values=IDX_BUCKETS,
        )
        # df/meta land as ADDITIVE DELTA APPENDS, not merges (r14): a
        # counter's streaming hot path is the Hudi-MOR trade — O(batch)
        # generation appends, SUM-folded at the (term-scoped, bloom-
        # pruned) probe — where the additive MERGE pays an O(index)
        # decision scan per batch (measured ~3 s/batch at sf0.1, the
        # same cost class the r13 postings-append note retired). The
        # batch-incremental path (tfidf_index_incremental) keeps the
        # MERGE form; the shared probes fold BOTH shapes identically.
        # Re-delivered batches still no-op whole commits via batch_id.
        append_partition_transaction(
            s, df_dir, "bucket", _index_df_counts(bpost), batch_id=batch_id,
            n_partition_values=IDX_BUCKETS,
        )
        m_docs = m_dl = None
        if written is not None:
            # the postings stage write materialized both observed
            # frames; BOUNDED wait (ADVICE r15 #1) — an unbounded
            # obs.get would hang the stream with no diagnostic if a
            # future short-circuit in the stage write (or a Spark
            # change in CollectMetrics-under-cache reporting) ever
            # skipped one observed plan
            m_docs = _obs_bounded(obs_docs)
            m_dl = _obs_bounded(obs_dl) if m_docs is not None else None
        if m_docs is not None and m_dl is not None:
            n_docs = int(m_docs["n"])
            sum_dl = int(m_dl["t"] or 0)
        else:
            # replayed postings commit (crash between the three commits)
            # or observation timeout: compute the scalars directly —
            # same values by definition
            n_docs = batch_df.count()
            row = bpost.agg(F.sum("tf").cast("long").alias("t")).collect()[0]
            sum_dl = int(row["t"] or 0)
        meta = s.createDataFrame(
            [("n_docs", n_docs, 0), ("sum_dl", sum_dl, 0)],
            "metric string, v long, pk int",
        )
        append_partition_transaction(
            s, meta_dir, "pk", meta, batch_id=batch_id, n_partition_values=1
        )
    finally:
        bpost.unpersist()
        batch_df.unpersist()


@register("stream_index_maintenance", _TFIDF_ORACLE)
def stream_index_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    """The inverted index maintained by a STREAMING writer — the form a
    continuously-crawling corpus actually runs: documents arrive as a
    3-micro-batch replay and each batch foreachBatch-commits its own
    delta into the same three tables tfidf_index_incremental builds —
    postings as pure inserts, df and N as ADDITIVE merges
    (``df = s.df + t.df``). Every commit carries the micro-batch's
    ``batch_id``, so a replayed batch (checkpoint restart, at-least-once
    upstream) no-ops instead of double-counting — the exactly-once
    contract for arithmetic state, where a double-apply is silent
    corruption rather than a duplicate row. A closing compaction
    re-establishes the term Blooms the merge-extended entries dropped
    (the stats_cols/bloom_cols OPTIMIZE overrides), then the SAME probe
    path answers the search.

    Oracle: tfidf_search's verbatim — so streamed-index ==
    batch-incremental-index == inline-scan is value-pinned three ways
    by the gate. Per-call scratch, reaped (the per-batch commit
    protocol is the measured thing, same family as
    stream_merge_conditional).

    Scale shape: per micro-batch the cost is O(batch tokens) postings
    insert + a df merge bounded by the batch's distinct terms + a 1-row
    N merge; the corpus is never re-scanned. At 100 TB this is the
    index-maintenance half of a search pipeline as one exactly-once
    streaming job."""
    import os as _os
    import tempfile

    from nshm2022db_spark.streaming.events import _reap_scratch, docs_stream
    from nshm2022db_spark.streaming.sinks import compact_partition_table

    root = tempfile.mkdtemp(prefix="tfidf_stream_idx_")
    post_dir = _os.path.join(root, "postings")
    df_dir = _os.path.join(root, "df")
    meta_dir = _os.path.join(root, "meta")
    ckpt = _os.path.join(root, "ckpt")

    apply_batch = lambda df, bid: _index_apply_batch(  # noqa: E731
        df, bid, post_dir, df_dir, meta_dir
    )

    q = (
        docs_stream(spark, sf)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    compact_partition_table(
        spark, post_dir, max_files_per_partition=1,
        stats_cols=["doc_id"], bloom_cols=["term"],
    )
    compact_partition_table(
        spark, df_dir, max_files_per_partition=1, bloom_cols=["term"]
    )
    out = _tfidf_probe_index(spark, post_dir, df_dir, meta_dir)
    return _reap_scratch(out, spark, root)


# ---------------------------------------------------------------------------
# BM25 — the standard ranking over the same index (Robertson/Spärck Jones;
# k1/b saturation + length normalization, Lucene's +1 IDF so scores stay
# non-negative). A PURE SCORING CHANGE on the postings/df/meta tables: the
# postings carry dl, the meta table carries sum_dl, and everything else —
# probes, pruning, maintenance, idempotence — is the TF-IDF machinery
# verbatim.
# ---------------------------------------------------------------------------

BM25_K1 = "1.2"  # term-frequency saturation (literal string: both engines
BM25_B = "0.75"  # parse the identical double)  # length-normalization mix


def _bm25_score(n: str, sum_dl: str, prefix: str, dl: str) -> str:
    """Σ_i idf_i · tf_i(k1+1) / (tf_i + k1(1 − b + b·dl/avgdl)) in FIXED
    term order, idf_i = ln(1 + (N − df_i + 0.5)/(df_i + 0.5)) (always
    ≥ 0), avgdl expanded as sum_dl/N so dl/avgdl = dl·N/sum_dl — every
    operand a per-row double op, so Spark and DuckDB produce the same
    bits (no data-ordered float SUM anywhere)."""
    parts = []
    for i in range(len(TFIDF_TERMS)):
        idf = (
            f"ln(1.0 + (CAST({n} AS DOUBLE) - CAST({prefix}df{i} AS DOUBLE)"
            f" + 0.5) / (CAST({prefix}df{i} AS DOUBLE) + 0.5))"
        )
        rel_dl = (
            f"CAST({dl} AS DOUBLE) * CAST({n} AS DOUBLE) / "
            f"CAST(greatest({sum_dl}, 1) AS DOUBLE)"
        )
        parts.append(
            f"{idf} * (CAST({prefix}tf{i} AS DOUBLE) * (1.0 + {BM25_K1})) / "
            f"(CAST({prefix}tf{i} AS DOUBLE) + {BM25_K1} * "
            f"(1.0 - {BM25_B} + {BM25_B} * {rel_dl}))"
        )
    return " + ".join(parts)


_BM25_ORACLE = f"""
    WITH tf AS (
        SELECT doc_id,
               CAST(len({duck_tokens(duck_ascii_lower('text'))}) AS BIGINT) AS dl,
               {', '.join(f"{_tf(w, True)} AS tf{i}" for i, w in enumerate(TFIDF_TERMS))}
        FROM documents),
    stats AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(dl) AS BIGINT) AS sum_dl,
               {', '.join(f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                          for i in range(len(TFIDF_TERMS)))}
        FROM tf)
    SELECT doc_id,
           {', '.join(f"tf{i}" for i in range(len(TFIDF_TERMS)))},
           dl,
           ROUND({_bm25_score('n', 'sum_dl', '', 'dl')}, 6) AS bm25_score
    FROM tf, stats
    WHERE {_bm25_score('n', 'sum_dl', '', 'dl')} > 0
    ORDER BY {_bm25_score('n', 'sum_dl', '', 'dl')} DESC, doc_id
    LIMIT {TFIDF_K}
"""


def _bm25_finish(scored: DataFrame) -> DataFrame:
    """Shared tail: positive-score filter, top-k (TakeOrderedAndProject),
    fixed-precision rounding — tfidf_search's discipline."""
    return (
        scored.filter(F.col("_score") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(TFIDF_K)
        .select(
            "doc_id",
            *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
            "dl",
            F.expr("ROUND(_score, 6)").alias("bm25_score"),
        )
    )


@register("bm25_search", _BM25_ORACLE)
def bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k documents by BM25 for the fixed query-term set — the
    ranking a search user actually expects (tf saturation: a term's
    50th occurrence adds ~nothing; length normalization: long documents
    stop winning on bulk).

    Same Spark-first shape as tfidf_search: per-doc tf and dl are
    MAP-SIDE array ops on the token array (no explode, no (doc, term)
    shuffle); corpus stats (N, sum_dl for avgdl, per-term df) are ONE
    1-row aggregate broadcast back over the scan; top-k plans as
    TakeOrderedAndProject. sum_dl is an exact integer SUM, so avgdl is
    order-independent and the doubles reproduce bit-for-bit."""
    tf_cols = [
        F.expr(_tf(w, False)).alias(f"tf{i}") for i, w in enumerate(TFIDF_TERMS)
    ]
    tf = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.expr(spark_tokens(spark_ascii_lower("text"))).alias("tk"))
        .select("doc_id", F.size("tk").cast("long").alias("dl"), *tf_cols)
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(TFIDF_TERMS))
        ],
    )
    scored = tf.join(F.broadcast(stats)).select(
        "doc_id",
        *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
        "dl",
        F.expr(_bm25_score("n", "sum_dl", "", "dl")).alias("_score"),
    )
    return _bm25_finish(scored)


def _bm25_probe_index(
    spark: SparkSession, post_dir: str, df_dir: str, meta_dir: str
) -> DataFrame:
    """BM25 answered from the SAME index tables the TF-IDF probe reads —
    the scoring swap is the whole diff. Each query term is one
    bloom-pruned point probe; dl rides in the posting rows (denormalized
    at build), so no doc-keyed length join happens at query time; N and
    sum_dl come from the 2-row meta table pivoted to one broadcast
    stats row."""
    from nshm2022db_spark.streaming.sinks import read_keyed_table

    probes = [
        read_keyed_table(spark, post_dir, prune={"term": ("eq", t)}).filter(
            F.col("term") == t
        )
        for t in TFIDF_TERMS
    ]
    post = probes[0]
    for p in probes[1:]:
        post = post.unionByName(p)
    tfw = post.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf{i}")
            for i, t in enumerate(TFIDF_TERMS)
        ],
        F.max("dl").cast("long").alias("dl"),  # same value on every posting
    )
    dprobes = [
        read_keyed_table(spark, df_dir, prune={"term": ("eq", t)}).filter(
            F.col("term") == t
        )
        for t in TFIDF_TERMS
    ]
    dfr = dprobes[0]
    for p in dprobes[1:]:
        dfr = dfr.unionByName(p)
    # SUM folds both table shapes — merged rows or per-batch MOR deltas
    # (see _tfidf_probe_index); integer sums, exact either way
    df_row = dfr.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("df"))), F.lit(0)
            ).alias(f"df{i}")
            for i, t in enumerate(TFIDF_TERMS)
        ]
    )
    meta = read_keyed_table(spark, meta_dir).agg(
        F.sum(F.when(F.col("metric") == "n_docs", F.col("v"))).alias("n"),
        F.sum(F.when(F.col("metric") == "sum_dl", F.col("v"))).alias("sum_dl"),
    )
    stats = df_row.crossJoin(meta)
    scored = tfw.join(F.broadcast(stats)).select(
        "doc_id",
        *[f"tf{i}" for i in range(len(TFIDF_TERMS))],
        "dl",
        F.expr(_bm25_score("n", "sum_dl", "", "dl")).alias("_score"),
    )
    return _bm25_finish(scored)


@register("bm25_index_stream", _BM25_ORACLE)
def bm25_index_stream(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 served from the STREAMING-MAINTAINED inverted index — the
    end-state search story: documents arrive as a micro-batch replay,
    each batch foreachBatch-commits its index delta (postings inserts
    carrying dl, ADDITIVE df and n_docs/sum_dl merges, exactly-once by
    batch_id — _index_apply_batch verbatim), a closing compaction
    restores the term Blooms, and the probe scores BM25.

    The oracle is bm25_search's inline-scan SQL, so
    streamed-index == inline-scan is value-pinned by the gate — the
    BM25 leg of the same three-way pin the TF-IDF family carries
    (stream_index_maintenance == tfidf_index_incremental ==
    tfidf_search). The index lands once per corpus (scratch-memoized):
    the measured thing is the QUERY side — bloom-pruned point probes +
    a 2-row meta pivot, flat in corpus size."""
    import os as _os

    from nshm2022db_spark.sources.scratch import (
        is_landed,
        mark_landed,
        scratch_path,
    )
    from nshm2022db_spark.streaming.events import docs_stream
    from nshm2022db_spark.streaming.sinks import compact_partition_table

    base = scratch_path("bm25_stream_idx_r15", sf)
    post_dir = _os.path.join(base, "postings")
    df_dir = _os.path.join(base, "df")
    meta_dir = _os.path.join(base, "meta")

    if not is_landed(base):
        ckpt = _os.path.join(base, "ckpt")
        apply_batch = lambda df, bid: _index_apply_batch(  # noqa: E731
            df, bid, post_dir, df_dir, meta_dir
        )
        q = (
            docs_stream(spark, sf)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        compact_partition_table(
            spark, post_dir, max_files_per_partition=1,
            stats_cols=["doc_id"], bloom_cols=["term"],
        )
        compact_partition_table(
            spark, df_dir, max_files_per_partition=1, bloom_cols=["term"]
        )
        mark_landed(base)

    return _bm25_probe_index(spark, post_dir, df_dir, meta_dir)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

BENCH_MOD = 23  # doc_id % BENCH_MOD == 0 plays the held-out benchmark set

_DECON_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {duck_shingle_hashes('hx')} AS s
        FROM (SELECT doc_id, {duck_token_hashes(duck_tokens(duck_ascii_lower('text')))} AS hx
              FROM documents)),
    bench AS (
        SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    train_ex AS (
        SELECT doc_id, unnest(s) AS x FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    hits AS (
        SELECT doc_id, COUNT(*) AS c
        FROM train_ex JOIN bench USING (x) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.c, 0) AS n_contaminated,
           COALESCE(h.c, 0) = 0 AS clean
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {BENCH_MOD} <> 0
"""


@register("decontaminate_ngram", _DECON_ORACLE)
def decontaminate_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    token-3-gram shingles it shares with a held-out benchmark set
    (doc_id % 23 == 0 stands in for the benchmark corpus), plus a `clean`
    flag. The standard pre-training hygiene step — eval sets must not
    leak into training data.

    Scale shape: shingles are hashed to int64 once (portable polynomial
    hash, shared with the dedup family); the benchmark's distinct shingle
    set is orders of magnitude smaller than the corpus and BROADCAST, so
    the contamination join is map-side; the corpus-side work is one
    partial-aggregated (doc_id, count) shuffle (the only other exchange
    is the distinct over the benchmark's own shingles — benchmark-sized,
    not corpus-sized).
    Shingle sets are distinct per document, so COUNT(*) of join hits is
    the distinct overlap size — no distinct-agg double shuffle."""
    sh = (
        read_table(spark, sf, "documents")
        .select(
            "doc_id",
            F.expr(spark_token_hashes(spark_tokens(spark_ascii_lower("text")))).alias("hx"),
        )
        .select("doc_id", F.explode(F.expr(spark_shingle_hashes("hx"))).alias("x"))
    )
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("x").distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "x")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    train = (
        read_table(spark, sf, "documents")
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id")
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("c"), F.lit(0)).alias("n_contaminated"),
        (F.coalesce(F.col("c"), F.lit(0)) == 0).alias("clean"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (constant-size benchmark summary)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 17  # 131072 bit positions
_BLOOM_A, _BLOOM_B = 48_271, 11  # second-hash affine constants


def _bloom_h1(x: str) -> str:
    return f"{x} % {BLOOM_BITS}"


def _bloom_h2(x: str) -> str:
    return f"(({x} * {_BLOOM_A} + {_BLOOM_B}) % {P}) % {BLOOM_BITS}"


_BLOOM_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {duck_shingle_hashes('hx')} AS s
        FROM (SELECT doc_id, {duck_token_hashes(duck_tokens(duck_ascii_lower('text')))} AS hx
              FROM documents)),
    bench_x AS (
        SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    bits AS (
        SELECT DISTINCT b FROM (
            SELECT {_bloom_h1('x')} AS b FROM bench_x
            UNION ALL
            SELECT {_bloom_h2('x')} AS b FROM bench_x)),
    train_ex AS (
        SELECT doc_id, unnest(s) AS x FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    flagged AS (
        SELECT doc_id,
               CASE WHEN {_bloom_h1('x')} IN (SELECT b FROM bits)
                     AND {_bloom_h2('x')} IN (SELECT b FROM bits)
                    THEN 1 ELSE 0 END AS hit
        FROM train_ex),
    hits AS (
        SELECT doc_id, CAST(SUM(hit) AS BIGINT) AS c
        FROM flagged GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.c, 0) AS BIGINT) AS n_candidates,
           COALESCE(h.c, 0) = 0 AS clean
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {BENCH_MOD} <> 0
"""


@register("decontaminate_bloom", _BLOOM_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination screen: like decontaminate_ngram, but
    the benchmark's shingle set is summarized as a CONSTANT-SIZE bit set
    (two deterministic hash positions per shingle, 2^17 bits = 16 KB)
    instead of broadcasting every benchmark shingle. A training shingle
    is a CANDIDATE iff both its bit positions are set — a superset of the
    true overlaps (false positives possible, false negatives impossible),
    which is the correct cheap FIRST PASS: only flagged docs proceed to
    the exact join. At 100 TB the benchmark suite can hold billions of
    shingles; the bitset stays 16 KB where the exact set would be tens of
    GB — the difference between a broadcast join and an impossible one.

    The bit math is the portable polynomial arithmetic, so the oracle
    reproduces the EXACT candidate set, false positives included — the
    screen itself is deterministic, auditable, and engine-independent.

    Plan: distinct bit positions (benchmark-sized agg) broadcast twice;
    the corpus side is map-only until one partial-aggregated (doc_id,
    count) shuffle. No corpus-keyed exchange anywhere."""
    sh = (
        read_table(spark, sf, "documents")
        .select(
            "doc_id",
            F.expr(spark_token_hashes(spark_tokens(spark_ascii_lower("text")))).alias("hx"),
        )
        .select("doc_id", F.explode(F.expr(spark_shingle_hashes("hx"))).alias("x"))
    )
    bench_bits = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.expr(_bloom_h1("x")).alias("b"))
        .unionAll(
            sh.filter(F.col("doc_id") % BENCH_MOD == 0).select(
                F.expr(_bloom_h2("x")).alias("b")
            )
        )
        .distinct()
    )
    b1 = F.broadcast(bench_bits.select(F.col("b").alias("h1"), F.lit(1).alias("m1")))
    b2 = F.broadcast(bench_bits.select(F.col("b").alias("h2"), F.lit(1).alias("m2")))
    train_ex = sh.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id",
        F.expr(_bloom_h1("x")).alias("h1"),
        F.expr(_bloom_h2("x")).alias("h2"),
    )
    flagged = (
        train_ex.join(b1, "h1", "left")
        .join(b2, "h2", "left")
        .select(
            "doc_id",
            (F.col("m1").isNotNull() & F.col("m2").isNotNull())
            .cast("long")
            .alias("hit"),
        )
    )
    hits = flagged.groupBy("doc_id").agg(F.sum("hit").alias("c"))
    train = (
        read_table(spark, sf, "documents")
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id")
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("c"), F.lit(0)).alias("n_candidates"),
        (F.coalesce(F.col("c"), F.lit(0)) == 0).alias("clean"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling (deterministic A-ES exponential race)
# ---------------------------------------------------------------------------

WSAMPLE_K = 40
_WS_A, _WS_B = 69_621, 7  # affine constants distinct from stratified_sample's


def _race_key(duck: bool) -> str:
    """Efraimidis–Spirakis via exponential race: e = -ln(u)/w with
    u ∈ (0, 1] from an affine hash of the doc id (u = (h+1)/(P+1) so
    ln never sees 0) and w = n_chars. The k SMALLEST keys are a weighted
    sample without replacement — and the same k on every engine, run, and
    partitioning, unlike rand()-based sampling."""
    u = f"(CAST((doc_id * {_WS_A} + {_WS_B}) % {P} AS DOUBLE) + 1.0) / {P + 1}.0"
    return f"-ln({u}) / CAST(greatest(n_chars, 1) AS DOUBLE)"


_WSAMPLE_ORACLE = f"""
    SELECT doc_id, n_chars, ROUND({_race_key(True)}, 9) AS race_key
    FROM documents
    ORDER BY {_race_key(True)}, doc_id
    LIMIT {WSAMPLE_K}
"""


@register("weighted_sample", _WSAMPLE_ORACLE)
def weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (weight =
    n_chars): map-only race-key computation + global top-k, which plans
    as TakeOrderedAndProject — each partition keeps its k best, the
    driver merges k·partitions rows. No shuffle of the corpus, ever."""
    keyed = read_table(spark, sf, "documents").select(
        "doc_id", "n_chars", F.expr(_race_key(False)).alias("_e")
    )
    return (
        keyed.orderBy("_e", "doc_id")
        .limit(WSAMPLE_K)
        .select("doc_id", "n_chars", F.expr("ROUND(_e, 9)").alias("race_key"))
    )


# ---------------------------------------------------------------------------
# Context-window sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 512  # tokens per packed training sequence


_PACK_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, lang, len({duck_tokens('text')}) AS n_tok
        FROM documents),
    cum AS (
        SELECT doc_id, lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok AS start_off
        FROM tok)
    SELECT lang,
           -- CASTs: DuckDB integer SUM widens to HUGEINT, which reaches
           -- the driver's hasher as decimal128 via Arrow and can never
           -- hash-equal Spark's int64 — pin every derived output to BIGINT.
           CAST(start_off // {PACK_BUDGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY lang, bin_id
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window packing: concatenate documents per language stream
    in doc_id order and cut the stream into fixed token-budget bins —
    each document lands in the bin containing its start offset (the
    concat-then-chunk packing used to fill training context windows).
    Output is the per-bin fill statistics.

    One exchange total: the running-offset window and the (lang, bin)
    rollup cluster on the same `lang` key, so Catalyst reuses the
    partitioning. Packing is inherently sequential per stream — at 100 TB
    the stream key is (lang, shard) so thousands of streams pack in
    parallel, exactly this plan with a composite key; integer arithmetic
    end-to-end, so the bin assignment is engine- and run-stable."""
    tok = read_table(spark, sf, "documents").select(
        "doc_id", "lang", F.expr(f"size({spark_tokens('text')})").alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = tok.select(
        "lang",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_off"),
    )
    return (
        cum.select("lang", "n_tok", F.expr(f"start_off div {PACK_BUDGET}").alias("bin_id"))
        .groupBy("lang", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))
    )


# ---------------------------------------------------------------------------
# Source-mixture sampling
# ---------------------------------------------------------------------------

_MIX_A, _MIX_B = 16_807, 3
_MIX_BASE, _MIX_STEP = 20, 5  # quota = 20 - (source_num % 3) * 5 → 20/15/10


def _mix_quota(duck: bool) -> str:
    sub = "substr" if duck else "substring"
    return f"{_MIX_BASE} - (CAST({sub}(source, 4) AS INT) % 3) * {_MIX_STEP}"


_MIX_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY (doc_id * {_MIX_A} + {_MIX_B}) % {P},
                                           doc_id) AS sample_rank
        FROM documents)
    SELECT doc_id, source, sample_rank
    FROM ranked
    WHERE sample_rank <= {_mix_quota(True)}
"""


@register("source_mix_sample", _MIX_ORACLE)
def source_mix_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture-weight subsampling: cap each source at a per-source quota
    (derived here from the source id; in production, the mixture-weights
    table), choosing WHICH documents survive by an affine-hash shuffle
    order — deterministic, so re-runs and backfills select identical
    rows. This is the 'domain mixing' step of corpus assembly.

    One exchange on `source` for the row_number window; the quota filter
    is a pure predicate on the window output. At 100 TB per-source skew is
    the hazard — a giant source funnels into one partition; production
    shape is a two-level rank (hash-bucket within source, then offset by
    bucket counts), same arithmetic, still one exchange."""
    order_key = (F.col("doc_id") * _MIX_A + _MIX_B) % P
    w = Window.partitionBy("source").orderBy(order_key.asc(), F.col("doc_id").asc())
    return (
        read_table(spark, sf, "documents")
        .select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= F.expr(_mix_quota(False)))
    )


# ---------------------------------------------------------------------------
# End-to-end curation pass (quality filter → exact dedup → stratified sample)
# ---------------------------------------------------------------------------

QUALITY_MIN = 0.4

# Quality, bucket, and rate formulas are IMPORTED from extensions.text —
# this pipeline composes text_quality_score / text_fingerprint /
# stratified_sample, and the composition claim is only true while the
# expressions are literally shared (hand-copied twins desync silently).
from nshm2022db_spark.extensions.text import (  # noqa: E402
    _SAMPLE_RATES as _TEXT_RATES,
    _bucket as _text_bucket,
    quality_expr,
)

_PIPELINE_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {quality_expr(True)} AS q,
               md5({{norm}}) AS fp
        FROM documents),
    kept AS (SELECT * FROM scored WHERE q >= {QUALITY_MIN}),
    deduped AS (
        SELECT doc_id, lang, ROUND(q, 6) AS quality_score,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM kept)
    SELECT doc_id, lang, quality_score
    FROM deduped
    WHERE rn = 1 AND CASE lang
        WHEN 'en' THEN {{bucket}} < {{r_en}}
        WHEN 'de' THEN {{bucket}} < {{r_de}}
        WHEN 'fr' THEN {{bucket}} < {{r_fr}}
        ELSE FALSE END
"""


@register(
    "curation_pipeline",
    _PIPELINE_ORACLE.format(
        norm=duck_norm_text("text"),
        bucket=_text_bucket("doc_id"),
        r_en=_TEXT_RATES["en"],
        r_de=_TEXT_RATES["de"],
        r_fr=_TEXT_RATES["fr"],
    ),
)
def curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The whole curation pass as ONE Spark job: quality-score filter
    (map) → exact dedup keeping the smallest doc_id per normalized-text
    md5 fingerprint (the pipeline's only shuffle) → deterministic
    per-language stratified sample (map). Composes the formulas of
    text_quality_score, text_fingerprint, and stratified_sample — the
    point is that the composition stays ONE plan with ONE exchange and
    no intermediate materialization, which is exactly how a 100 TB
    curation pass should run (the quality filter folds into the scan, so
    only quality-passing rows ever shuffle).

    Stage ORDER is semantic, not just cost: the sample filter must run
    AFTER dedup, because the canonical survivor of a duplicate group is
    defined over the full deduped corpus — pushing the sample predicate
    below the dedup window would let a group whose smallest-id member is
    sampled out resurrect a larger-id duplicate (caught by the sf0.1
    oracle run: a cross-language duplicate pair, round 3)."""
    norm = spark_norm_text("text")
    scored = read_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.expr(quality_expr(False)).alias("q"),
        F.expr(f"md5({norm})").alias("fp"),
    )
    kept = scored.filter(F.col("q") >= QUALITY_MIN)
    w = Window.partitionBy("fp").orderBy("doc_id")
    bucket = F.expr(_text_bucket("doc_id"))
    keep = F.lit(False)
    for lang, rate in _TEXT_RATES.items():
        keep = F.when(F.col("lang") == lang, bucket < rate).otherwise(keep)
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(keep)
        .select("doc_id", "lang", F.expr("ROUND(q, 6)").alias("quality_score"))
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (RAG / context-window preprocessing)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 128
CHUNK_OVERLAP = 16
_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

_CHUNK_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, len({duck_tokens('text')}) AS n FROM documents),
    spans AS (
        SELECT doc_id, n,
               greatest(1, (n - {CHUNK_OVERLAP} + {_STEP} - 1) // {_STEP})
                   AS n_chunks
        FROM tok)
    SELECT doc_id,
           i AS chunk_id,
           i * {_STEP} AS tok_start,
           least(i * {_STEP} + {CHUNK_TOKENS}, n) AS tok_end
    -- ORACLE-ONLY bound: the cross-unnest needs a finite series; 10000
    -- chunks = ~1.12M whitespace tokens in one document, far above any
    -- real row (testdata max is ~3 orders of magnitude smaller). The
    -- Spark side emits ALL chunks — a pathological giant document would
    -- hash-mismatch here rather than silently truncate.
    FROM spans, (SELECT unnest(range(0, 10000)) AS i)
    WHERE i < n_chunks
"""


@register("chunk_documents", _CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    fixed-token-budget chunks (the retrieval/context-window preprocessing
    step — chunk k covers tokens [k·(B−O), k·(B−O)+B)), emitting one row
    per chunk with its token span. ceil arithmetic keeps every tail:
    the last chunk is shorter, never dropped, and a doc under one budget
    yields exactly one chunk.

    Map-only: tokenize once, compute the chunk count, explode a generated
    index sequence — the chunk rows materialize inside the scan stage
    with NO shuffle at any corpus size (the oracle's bounded-range cross
    join is the relational rendering of the same explode). Integer
    arithmetic end-to-end — exact on every engine."""
    toks = (
        read_table(spark, sf, "documents")
        .select("doc_id", F.expr(f"size({spark_tokens('text')})").alias("n"))
        .select(
            "doc_id",
            "n",
            F.expr(
                f"greatest(1, (n - {CHUNK_OVERLAP} + {_STEP} - 1) div {_STEP})"
            ).alias("n_chunks"),
        )
    )
    return toks.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id"),
        "n",
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * _STEP).alias("tok_start"),
        F.least(F.col("chunk_id") * _STEP + CHUNK_TOKENS, F.col("n")).alias(
            "tok_end"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle → training shards
# ---------------------------------------------------------------------------

N_SHARDS = 8
EPOCH = 2  # the epoch number IS the seed: epoch 3 permutes differently
_EP_A, _EP_B = 48_271, 11  # affine permutation in Z_P


_EPOCH_ORACLE = f"""
    WITH keyed AS (
        SELECT doc_id, (doc_id * {_EP_A} + {EPOCH} * {_EP_B}) % {P} AS k
        FROM documents)
    SELECT doc_id,
           CAST(k % {N_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY k % {N_SHARDS}
                                   ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed
"""


@register("epoch_shuffle", _EPOCH_ORACLE)
def epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible training-epoch shuffle: every document gets a
    pseudo-random but DETERMINISTIC (shard, position) for the epoch —
    an affine permutation of doc_id in Z_P keyed by the epoch number,
    so every re-run, backfill, and resumed job agrees on exactly which
    example lands where, with no stored permutation table (the property
    a training-data loader needs for mid-epoch checkpoint resume).

    Scale shape: the permutation key is map-side arithmetic; the only
    exchange is the window's hash partition on `shard` (N_SHARDS
    streams write in parallel — at 100 TB shards map 1:1 onto writer
    tasks, so this plan IS the shard writer). Integer arithmetic
    end-to-end: engine- and run-stable."""
    keyed = read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(f"(doc_id * {_EP_A} + {EPOCH} * {_EP_B}) % {P}").alias("k"),
    )
    w = Window.partitionBy(F.col("k") % N_SHARDS).orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        (F.col("k") % N_SHARDS).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Quality-weighted upsampling (mixture weighting by replication)
# ---------------------------------------------------------------------------

_UP_HI, _UP_MID = 800, 400  # n_chars thresholds → 3x / 2x / 1x


# One portable string — the CASE chain is identical SQL on both engines
# (a dialect parameter here would imply a distinction that doesn't exist)
_N_COPIES = (
    f"CASE WHEN n_chars >= {_UP_HI} THEN 3 "
    f"WHEN n_chars >= {_UP_MID} THEN 2 ELSE 1 END"
)


_UPSAMPLE_ORACLE = f"""
    SELECT doc_id,
           CAST(unnest(generate_series(1, {_N_COPIES})) AS BIGINT)
               AS copy_idx,
           CAST({_N_COPIES} AS BIGINT) AS n_copies
    FROM documents
"""


@register("quality_upsample", _UPSAMPLE_ORACLE)
def quality_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture weighting by deterministic replication: high-quality
    documents (proxy: length bucket) are duplicated 2-3x in the
    training stream — the up-sampling half of data mixing, where
    curated/high-value sources are repeated for more gradient exposure
    while bulk text passes once. Deterministic (no RNG): the copy count
    is a pure function of the row, so the epoch composition is exactly
    reproducible and auditable (sum of n_copies = stream length).

    Map-only: bucket arithmetic + explode of a generated index inside
    the scan stage — no shuffle at any corpus size; the oracle's
    generate_series unnest is the same explode relationally."""
    docs = read_table(spark, sf, "documents").select(
        "doc_id", F.expr(_N_COPIES).alias("nc")
    )
    return docs.select(
        "doc_id",
        F.explode(F.expr("sequence(1, nc)")).alias("copy_idx"),
        F.col("nc").cast("long").alias("n_copies"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("long"))


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every document by how
# much more likely its hashed-n-gram features are under a TARGET
# distribution than under the raw corpus, then sample proportionally via
# deterministic Gumbel top-k. The production shape for "make the pretrain
# mix look like the high-quality target" at 100 TB.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 512  # hashed-feature dimensionality (the paper uses 10^4)
DSIR_K = 50  # documents selected
DSIR_TARGET_LANG = "en"  # target-distribution proxy in the synthetic corpus
_DSIR_A, _DSIR_B = 48_271, 11  # Gumbel affine constants (distinct streams)


def _dsir_gumbel() -> str:
    """Deterministic Gumbel noise g = -ln(-ln(u)) with u in (0, 1) from an
    affine hash of doc_id — h in [0, P) gives u <= P/(P+1) < 1 and
    u >= 1/(P+1) > 0, so neither ln ever sees 0 or 1. ONE engine-shared
    string by design (plain arithmetic both engines parse identically —
    unlike the dotted/hashed siblings there is no syntax divergence to
    branch on), same doubles both sides (the weighted_sample race-key
    discipline)."""
    u = (
        f"(CAST((doc_id * {_DSIR_A} + {_DSIR_B}) % {P} AS DOUBLE) + 1.0)"
        f" / {P + 1}.0"
    )
    return f"-ln(-ln({u}))"


_DSIR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({duck_tokens(duck_ascii_lower('text'))}) AS tok
        FROM documents),
    b AS (
        SELECT doc_id, lang, ({duck_char_hash('tok')}) % {DSIR_BUCKETS} AS bk
        FROM toks),
    raw AS (SELECT bk, COUNT(*) AS cr FROM b GROUP BY bk),
    tgt AS (SELECT bk, COUNT(*) AS ct FROM b
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bk),
    tot AS (SELECT (SELECT COUNT(*) FROM b) AS tr,
                   (SELECT COUNT(*) FROM b
                    WHERE lang = '{DSIR_TARGET_LANG}') AS tt),
    delta AS (
        SELECT raw.bk,
               ln(COALESCE(ct, 0) + 1.0) - ln(tt + {DSIR_BUCKETS}.0)
               - ln(cr + 1.0) + ln(tr + {DSIR_BUCKETS}.0) AS d
        FROM raw LEFT JOIN tgt USING (bk), tot),
    w AS (
        SELECT doc_id, ANY_VALUE(lang) AS lang, SUM(d) AS logw
        FROM b JOIN delta USING (bk) GROUP BY doc_id)
    SELECT doc_id, lang, ROUND(logw, 6) AS log_importance
    FROM w
    ORDER BY ROUND(logw + ({_dsir_gumbel()}), 6) DESC, doc_id
    LIMIT {DSIR_K}
"""


@register("dsir_select", _DSIR_ORACLE)
def dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """Importance resampling over hashed unigram features: the per-bucket
    log-likelihood-ratio model ln p_target(b) - ln p_raw(b) (add-1
    smoothed) is built from two corpus passes, each reduced to at most
    {DSIR_BUCKETS} rows, and every document's log importance weight is
    the sum of its tokens' bucket ratios. Selection is Gumbel top-k on
    logw + g(doc_id) — sampling proportional to the importance weights,
    but a pure function of the row like every sampler here, so the
    selected set is identical on every engine, run, and partitioning.

    Scale shape: TWO corpus passes total — one bucket aggregation
    builds raw AND target counts together (a conditional count; the
    totals re-aggregate from the bounded model itself, never the
    corpus), one scoring pass joins the broadcast model and shuffles
    only on doc_id; the final top-k plans as TakeOrderedAndProject.
    The model is bounded by the bucket count ({DSIR_BUCKETS} rows — a
    constant, not corpus-scaling).
    Floats follow the lm-scorer discipline: per-doc sums of doubles
    are ROUND()ed identically on both sides, and the Gumbel key is
    ordered on its rounded value with a doc_id tiebreak. Both corpus
    passes tokenize pre-exchange on the scan partition, so the scan is
    spread (sources.spread; r14, 1.6x)."""
    toks = (
        spread(
            read_table(spark, sf, "documents").select(
                "doc_id", "lang", "text"
            )
        )
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(spark_tokens(spark_ascii_lower("text")))
            ).alias("tok"),
        )
        .select(
            "doc_id",
            "lang",
            (F.expr(spark_char_hash("tok")) % DSIR_BUCKETS).alias("bk"),
        )
    )
    # ONE model pass: raw and target counts come out of the same
    # bucket aggregation (a conditional count), and the two totals are
    # re-aggregated from the <= DSIR_BUCKETS-row model itself — one
    # corpus tokenize+explode instead of three (r9 review #3; Spark
    # plans self-join sides independently, so separate raw/tgt/tot
    # DataFrames each re-scan the corpus)
    model = toks.groupBy("bk").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1)
        ).alias("ct"),
    )
    tot = model.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    # the model is bounded by the bucket constant (<= DSIR_BUCKETS rows)
    # and the totals are 1 row — both broadcast-safe at ANY corpus size
    delta = model.crossJoin(F.broadcast(tot)).select(
        "bk",
        (
            F.log(F.col("ct") + 1.0)
            - F.log(F.col("tt") + float(DSIR_BUCKETS))
            - F.log(F.col("cr") + 1.0)
            + F.log(F.col("tr") + float(DSIR_BUCKETS))
        ).alias("d"),
    )
    w = (
        toks.join(F.broadcast(delta), "bk")
        .groupBy("doc_id")
        .agg(F.any_value("lang").alias("lang"), F.sum("d").alias("logw"))
    )
    key = F.round(F.col("logw") + F.expr(_dsir_gumbel()), 6)
    return (
        w.orderBy(key.desc(), "doc_id")
        .limit(DSIR_K)
        .select("doc_id", "lang", F.round("logw", 6).alias("log_importance"))
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical ranker
# (TF-IDF over the query terms) and a vector ranker (cosine to a query
# embedding). The standard production shape for RAG / training-data
# retrieval — two independent top-N lists fused by rank, not by score, so
# the fusion needs no score calibration between rankers.
# ---------------------------------------------------------------------------

HYBRID_N = 100  # per-ranker candidate list length
HYBRID_K = 20  # fused results returned
RRF_C = 60  # the standard RRF damping constant (Cormack et al.)
HYBRID_QUERY_VEC_ID = 0  # embedding playing the query vector


def _cos_expr(q: str, e: str, duck: bool) -> str:
    """cos(q, e) with IDENTICAL structure both engines: three sequential
    -fold dots and two sqrts — bit-identical doubles, so the rank
    windows order the same rows on both sides."""
    dot = duck_dot if duck else spark_dot
    return (
        f"{dot(q, e)} / (sqrt({dot(q, q)}) * sqrt({dot(e, e)}))"
    )


_HYBRID_ORACLE = f"""
    WITH tf AS (
        SELECT doc_id,
               {', '.join(f"{_tf(w, True)} AS tf{i}" for i, w in enumerate(TFIDF_TERMS))}
        FROM documents),
    stats AS (
        SELECT COUNT(*) AS n,
               {', '.join(f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                          for i in range(len(TFIDF_TERMS)))}
        FROM tf),
    lexall AS (
        SELECT doc_id, {_score('n', '', True)} AS s
        FROM tf, stats
        WHERE {_score('n', '', True)} > 0),
    lex AS (
        SELECT doc_id, lex_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS lex_rank
            FROM lexall)
        WHERE lex_rank <= {HYBRID_N}),
    qv AS (SELECT embedding AS q FROM embeddings
           WHERE vec_id = {HYBRID_QUERY_VEC_ID}),
    cosall AS (
        SELECT vec_id AS doc_id,
               {_cos_expr('q', 'embedding', True)} AS c
        FROM embeddings, qv),
    vec AS (
        SELECT doc_id, vec_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS vec_rank
            FROM cosall)
        WHERE vec_rank <= {HYBRID_N}),
    fused AS (
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(vec_rank AS BIGINT) AS vec_rank,
               COALESCE(1.0 / ({RRF_C} + lex_rank), 0.0)
               + COALESCE(1.0 / ({RRF_C} + vec_rank), 0.0) AS rrf
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
    SELECT doc_id, lex_rank, vec_rank, ROUND(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {HYBRID_K}
"""


@register("hybrid_search_rrf", _HYBRID_ORACLE)
def hybrid_search_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of TF-IDF and embedding-cosine retrieval:
    rrf(d) = sum over rankers of 1 / (C + rank_i(d)) over each ranker's
    top-N list, fused by FULL OUTER join on doc_id (a document strong
    in either list surfaces). Rank fusion needs no cross-ranker score
    calibration — the reason RRF is the default hybrid in production
    retrieval stacks.

    Scale shape: the lexical pass is tfidf_search's (map-side term
    frequencies, one 1-row stats broadcast, TakeOrderedAndProject
    top-N); the vector pass broadcasts the 1-row query embedding and
    scores map-side with hoistable fold dots, top-N again; ranking,
    fusion, and the final top-k then run over two <= N-row lists —
    bounded by constants, not the corpus. Two corpus scans total, no
    wide exchange. Determinism: both rankers order by bit-identical
    doubles (fixed-order fold sums) with doc_id tiebreaks, so the rank
    integers — and therefore the fused scores — are exact cross-engine."""
    # lexical top-N (the tfidf_search shape, reduced to ranks)
    tf_cols = [
        F.expr(_tf(w, False)).alias(f"tf{i}")
        for i, w in enumerate(TFIDF_TERMS)
    ]
    tf = (
        spread(read_table(spark, sf, "documents").select("doc_id", "text"))
        .select(
            "doc_id",
            F.expr(spark_tokens(spark_ascii_lower("text"))).alias("tk"),
        )
        .select("doc_id", *tf_cols)
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(TFIDF_TERMS))
        ],
    )
    lex_top = (
        tf.join(F.broadcast(stats))
        .select("doc_id", F.expr(_score("n", "", False)).alias("s"))
        .filter(F.col("s") > 0)
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(HYBRID_N)
    )
    # rank the <= N-row list (single tiny partition — post-top-N, so the
    # unpartitioned window is constant-sized at any corpus scale)
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("s").desc(), "doc_id"))
        .cast("long")
        .alias("lex_rank"),
    )
    # vector top-N (the knn shape with a single broadcast query row)
    emb = read_table(spark, sf, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC_ID).select(
            F.col("embedding").alias("q")
        )
    )
    cos_top = (
        spread(emb).crossJoin(q)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(_cos_expr("q", "embedding", False)).alias("c"),
        )
        .orderBy(F.col("c").desc(), "doc_id")
        .limit(HYBRID_N)
    )
    vec = cos_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "doc_id"))
        .cast("long")
        .alias("vec_rank"),
    )
    fused = lex.join(vec, "doc_id", "full").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(1.0 / (RRF_C + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_C + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(HYBRID_K)
        .select(
            "doc_id", "lex_rank", "vec_rank",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-free train/val/test split: assignment is a pure function of the
# DUPLICATE-GROUP fingerprint, never the document, so exact near-copies can
# never straddle splits (the classic eval-inflation bug: a test document's
# duplicate in train makes the benchmark score a memorization measure).
# ---------------------------------------------------------------------------

SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10  # train/val/test = 80/10/10
_SPLIT_A, _SPLIT_B = 16_807, 3  # affine split-hash constants


def _split_case(h: str) -> str:
    """'train'/'val'/'test' from an integer via affine hash mod 100 —
    engine-shared arithmetic (the _dsir_gumbel discipline)."""
    u = f"(({h}) * {_SPLIT_A} + {_SPLIT_B}) % {P} % 100"
    return (
        f"CASE WHEN {u} < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {u} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


_SPLIT_ORACLE = f"""
    WITH d AS (
        SELECT doc_id,
               {duck_char_hash(duck_norm_text('text'))} AS fp
        FROM documents),
    g AS (
        SELECT fp,
               COUNT(*) AS n,
               -- what NAIVE per-document assignment would do to this
               -- group: >1 distinct split = a leaking group
               COUNT(DISTINCT {_split_case('doc_id')}) AS n_naive_splits
        FROM d GROUP BY fp),
    a AS (
        SELECT fp, n, n_naive_splits, {_split_case('fp')} AS split FROM g),
    leak AS (
        SELECT CAST(COUNT(*) FILTER (WHERE n_naive_splits > 1) AS BIGINT)
                   AS naive_straddling_groups
        FROM a)
    SELECT split,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_groups,
           naive_straddling_groups
    FROM a, leak
    GROUP BY split, naive_straddling_groups
"""


@register("split_leakage_free", _SPLIT_ORACLE)
def split_leakage_free(spark: SparkSession, sf: str) -> DataFrame:
    """Group-aware dataset split: documents are grouped by the exact-dedup
    fingerprint (normalized-text polynomial hash — the `dedup_exact`
    key), each GROUP is hashed to train/val/test, and every member
    inherits the group's split — duplicates can never straddle, by
    construction rather than by audit. The result also reports
    `naive_straddling_groups`: how many duplicate groups WOULD leak
    across splits under per-document assignment — the data-dependent
    number that justifies the operator, value-checked by the oracle.

    Scale shape: ONE fingerprint exchange (the same shuffle dedup_exact
    pays) reduces the corpus to group rows carrying size + the naive
    leak flag; the split rollup and the 1-row leak total then run over
    group-sized data, with the total broadcast back. Assignment is a
    pure function of the fingerprint — reproducible on any engine,
    run, or partitioning, and INCREMENTAL: a new document joins its
    group's existing split without reshuffling history (the property a
    growing 100 TB corpus needs — re-randomizing splits per snapshot
    would leak test data into yesterday's training run)."""
    d = read_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(spark_char_hash(spark_norm_text("text"))).alias("fp"),
    )
    # ONE corpus scan, ONE fp exchange (r10 review fix: the first cut
    # computed the leak total on a SEPARATE crossJoin branch — Spark
    # re-plans shared subtrees with zero ReusedExchange, so the corpus
    # was scanned and fingerprinted twice). min!=max replaces
    # countDistinct for the straddle flag (no Expand exchange), and the
    # global total is a window over the ≤3-row split rollup.
    g = d.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.min(F.expr(_split_case("doc_id")))
            != F.max(F.expr(_split_case("doc_id")))
        ).alias("straddles"),
    )
    roll = (
        g.select("fp", "n", "straddles", F.expr(_split_case("fp")).alias("split"))
        .groupBy("split")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.col("straddles").cast("long")).alias("_straddling"),
        )
    )
    # unpartitioned window over the ≤3-row rollup only (plan-pinned)
    return (
        roll.withColumn(
            "naive_straddling_groups",
            F.sum("_straddling").over(Window.partitionBy()),
        )
        .select("split", "n_docs", "n_groups", "naive_straddling_groups")
    )
