"""Curation operators (extensions/curation.py): independent Python
recomputes at sf0.001 (50 docs — exhaustive checks are cheap), plus
plan-shape pins for the scale claims in the docstrings."""

from __future__ import annotations

import math
import re

import pytest

from nshm2022db_spark.extensions.curation import (
    BENCH_MOD,
    PACK_BUDGET,
    TFIDF_TERMS,
    WSAMPLE_K,
    _MIX_A,
    _MIX_B,
    _WS_A,
    _WS_B,
    decontaminate_ngram,
    pack_sequences,
    source_mix_sample,
    tfidf_search,
    weighted_sample,
)
from nshm2022db_spark.functions.portable import P


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


def _char_hash(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P
    return acc


def _shingle_hashes(text: str) -> set[int]:
    hx = [_char_hash(t) for t in _tokens(text.lower())]
    return {
        (hx[i] * 961 + hx[i + 1] * 31 + hx[i + 2]) % P
        for i in range(len(hx) - 2)
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


class TestTfidfSearch:
    def test_scores_sorted_and_tf_recomputed(self, spark, sf_dir, docs):
        rows = tfidf_search(spark, sf_dir).collect()
        assert 0 < len(rows) <= 50
        scores = [r["tfidf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        for r in rows[:5]:
            toks = _tokens(docs[r["doc_id"]]["text"].lower())
            for i, term in enumerate(TFIDF_TERMS):
                assert r[f"tf{i}"] == toks.count(term)

    def test_plan_topk_no_python(self, spark, sf_dir):
        plan = tfidf_search(spark, sf_dir)._jdf.queryExecution().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestDecontaminate:
    def test_matches_python_recompute(self, spark, sf_dir, docs):
        bench: set[int] = set()
        for d, r in docs.items():
            if d % BENCH_MOD == 0:
                bench |= _shingle_hashes(r["text"])
        expected = {
            d: len(_shingle_hashes(r["text"]) & bench)
            for d, r in docs.items()
            if d % BENCH_MOD != 0
        }
        got = {
            r["doc_id"]: r["n_contaminated"]
            for r in decontaminate_ngram(spark, sf_dir).collect()
        }
        assert got == expected

    def test_clean_flag(self, spark, sf_dir):
        for r in decontaminate_ngram(spark, sf_dir).collect():
            assert r["clean"] == (r["n_contaminated"] == 0)
            assert r["doc_id"] % BENCH_MOD != 0


class TestWeightedSample:
    def test_matches_python_recompute(self, spark, sf_dir, docs):
        def key(d):
            u = ((d * _WS_A + _WS_B) % P + 1.0) / (P + 1)
            return -math.log(u) / max(docs[d]["n_chars"], 1)

        expected = sorted(docs, key=lambda d: (key(d), d))[:WSAMPLE_K]
        got = [r["doc_id"] for r in weighted_sample(spark, sf_dir).collect()]
        assert got == expected

    def test_plan_topk(self, spark, sf_dir):
        plan = weighted_sample(spark, sf_dir)._jdf.queryExecution().toString()
        assert "TakeOrderedAndProject" in plan


class TestPackSequences:
    def test_matches_python_recompute(self, spark, sf_dir, docs):
        expected: dict[tuple, list[int]] = {}
        by_lang: dict[str, list[int]] = {}
        for d in sorted(docs):
            by_lang.setdefault(docs[d]["lang"], []).append(d)
        for lang, ids in by_lang.items():
            off = 0
            for d in ids:
                n = len(_tokens(docs[d]["text"]))
                b = off // PACK_BUDGET
                agg = expected.setdefault((lang, b), [0, 0])
                agg[0] += 1
                agg[1] += n
                off += n
        got = {
            (r["lang"], r["bin_id"]): [r["n_docs"], r["bin_tokens"]]
            for r in pack_sequences(spark, sf_dir).collect()
        }
        assert got == expected

    def test_single_exchange(self, spark, sf_dir):
        """Window and rollup cluster on the same key: exactly one
        shuffle in the whole plan."""
        plan = pack_sequences(spark, sf_dir)._jdf.queryExecution().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestSourceMixSample:
    def test_matches_python_recompute(self, spark, sf_dir, docs):
        by_src: dict[str, list[int]] = {}
        for d, r in docs.items():
            by_src.setdefault(r["source"], []).append(d)
        expected = set()
        for src, ids in by_src.items():
            quota = 20 - (int(src[3:]) % 3) * 5
            ids.sort(key=lambda d: ((d * _MIX_A + _MIX_B) % P, d))
            for rank, d in enumerate(ids[:quota], start=1):
                expected.add((d, src, rank))
        got = {
            (r["doc_id"], r["source"], r["sample_rank"])
            for r in source_mix_sample(spark, sf_dir).collect()
        }
        assert got == expected

    def test_deterministic_across_runs(self, spark, sf_dir):
        a = sorted(map(tuple, source_mix_sample(spark, sf_dir).collect()))
        b = sorted(map(tuple, source_mix_sample(spark, sf_dir).collect()))
        assert a == b


class TestCurationPipeline:
    def test_single_exchange_and_no_python(self, spark, sf_dir):
        """Quality filter and sample predicate are map-side; the fingerprint
        dedup window is the pipeline's ONLY shuffle."""
        from nshm2022db_spark.extensions.curation import curation_pipeline

        plan = curation_pipeline(spark, sf_dir)._jdf.queryExecution().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_subset_semantics(self, spark, sf_dir):
        """Every surviving doc passes quality, is its fingerprint's min id,
        and is in its language's sample."""
        from nshm2022db_spark.extensions.curation import (
            QUALITY_MIN,
            curation_pipeline,
        )

        rows = curation_pipeline(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.quality_score >= QUALITY_MIN
            assert r.lang in ("en", "de", "fr")


class TestChunkDocuments:
    def test_matches_python_recompute(self, spark, sf_dir, docs):
        from nshm2022db_spark.extensions.curation import (
            CHUNK_OVERLAP,
            CHUNK_TOKENS,
            chunk_documents,
        )

        step = CHUNK_TOKENS - CHUNK_OVERLAP
        expected = set()
        for d, r in docs.items():
            n = len(_tokens(r["text"]))
            n_chunks = max(1, -(-(n - CHUNK_OVERLAP) // step))
            for i in range(n_chunks):
                expected.add((d, i, i * step, min(i * step + CHUNK_TOKENS, n)))
        got = {
            (r.doc_id, r.chunk_id, r.tok_start, r.tok_end)
            for r in chunk_documents(spark, sf_dir).collect()
        }
        assert got == expected

    def test_no_shuffle(self, spark, sf_dir):
        from nshm2022db_spark.extensions.curation import chunk_documents

        plan = chunk_documents(spark, sf_dir)._jdf.queryExecution().toString()
        assert "Exchange hashpartitioning" not in plan


class TestPipelineStageOrder:
    def test_dedup_runs_before_sample_filter(self, spark, tmp_path):
        """A duplicate group whose canonical (smallest-id) member is
        sampled OUT must NOT resurrect a larger-id duplicate: dedup picks
        survivors over the full quality-kept corpus first, then the
        sample filter applies. (Regression: sf0.1 oracle run caught the
        sample predicate pushed below the dedup window.)"""
        from nshm2022db_spark.extensions.curation import P, curation_pipeline

        # Find a doc_id pair where the smaller id fails the 'de' bucket
        # test's sampling... simpler: plant ids directly. bucket(id) =
        # ((id*48271+11) % P) % 100; lang 'de' keeps bucket < 80, lang
        # 'xx' keeps nothing (not in rates → filtered).
        good_text = "clean words " * 40  # passes the quality filter
        rows = [
            (10, good_text, "xx", "s", len(good_text)),  # canonical; lang sampled out
            (20, good_text, "de", "s", len(good_text)),  # duplicate of 10
            (30, "other clean words " * 30, "de", "s", 1),
        ]
        d = str(tmp_path / "docs")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

        got = {r.doc_id for r in curation_pipeline(spark, d).collect()}
        # Doc 20 is a duplicate of doc 10 (the canonical survivor); that
        # doc 10's language is sampled out must not bring doc 20 back.
        assert 20 not in got
        assert 30 in got or ((30 * 48271 + 11) % P) % 100 >= 80


class TestEpochShuffle:
    def test_permutation_and_python_recompute(self, spark, sf_dir, docs):
        from nshm2022db_spark.extensions.curation import (
            _EP_A,
            _EP_B,
            EPOCH,
            N_SHARDS,
            epoch_shuffle,
        )

        rows = epoch_shuffle(spark, sf_dir).collect()
        # bijection: every doc exactly once
        assert sorted(r["doc_id"] for r in rows) == sorted(docs)

        def k(d):
            return (d * _EP_A + EPOCH * _EP_B) % P

        by_shard: dict[int, list] = {}
        for r in rows:
            assert r["shard"] == k(r["doc_id"]) % N_SHARDS
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, rs in by_shard.items():
            # positions dense 1..n and ordered by the permutation key
            assert sorted(r["pos"] for r in rs) == list(range(1, len(rs) + 1))
            got = [r["doc_id"] for r in sorted(rs, key=lambda r: r["pos"])]
            expect = sorted(
                (d for d in docs if k(d) % N_SHARDS == shard),
                key=lambda d: (k(d), d),
            )
            assert got == expect

    def test_single_exchange(self, spark, sf_dir):
        from nshm2022db_spark.extensions.curation import epoch_shuffle

        plan = epoch_shuffle(spark, sf_dir)._jdf.queryExecution().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestQualityUpsample:
    def test_copy_counts_and_dense_indices(self, spark, sf_dir, docs):
        from nshm2022db_spark.extensions.curation import (
            _UP_HI,
            _UP_MID,
            quality_upsample,
        )

        rows = quality_upsample(spark, sf_dir).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(docs)  # nothing dropped
        for d, rec in docs.items():
            n = 3 if rec["n_chars"] >= _UP_HI else (
                2 if rec["n_chars"] >= _UP_MID else 1
            )
            idxs = sorted(r["copy_idx"] for r in by_doc[d])
            assert idxs == list(range(1, n + 1))
            assert all(r["n_copies"] == n for r in by_doc[d])

    def test_no_shuffle(self, spark, sf_dir):
        from nshm2022db_spark.extensions.curation import quality_upsample

        plan = quality_upsample(spark, sf_dir)._jdf.queryExecution().toString()
        assert "Exchange" not in plan


class TestTfidfIndexIncremental:
    """Incrementally-maintained inverted index (postings/df/meta
    lakehouse tables) — search parity, build idempotence, and the
    point-probe pruning claim."""

    def test_matches_inline_search(self, spark, sf_dir):
        from nshm2022db_spark.registry import QUERIES

        idx = sorted(
            tuple(r)
            for r in QUERIES["tfidf_index_incremental"](spark, sf_dir).collect()
        )
        inline = sorted(
            tuple(r) for r in QUERIES["tfidf_search"](spark, sf_dir).collect()
        )
        assert idx == inline

    def test_point_probe_prunes_buckets(self, spark, sf_dir):
        """After the post-merge compaction re-established term blooms,
        an ("eq", term) probe opens only the term's bucket."""
        import os

        from nshm2022db_spark.registry import QUERIES
        from nshm2022db_spark.sources.scratch import scratch_path
        from nshm2022db_spark.streaming.sinks import read_keyed_table

        QUERIES["tfidf_index_incremental"](spark, sf_dir).collect()
        post_dir = os.path.join(scratch_path("tfidf_index_r15", sf_dir), "postings")
        full = read_keyed_table(spark, post_dir)
        pruned = read_keyed_table(
            spark, post_dir, prune={"term": ("eq", TFIDF_TERMS[0])}
        )
        assert len(pruned.inputFiles()) < len(full.inputFiles())

    def test_retry_merge_noops(self, spark, sf_dir):
        """A crashed-and-retried build re-issues the delta merge with the
        same batch_id: the ledger makes it a no-op — df counts do not
        double."""
        import os

        from nshm2022db_spark.registry import QUERIES
        from nshm2022db_spark.sources.scratch import scratch_path
        from nshm2022db_spark.streaming.sinks import (
            merge_into_table,
            read_keyed_table,
        )

        QUERIES["tfidf_index_incremental"](spark, sf_dir).collect()
        df_dir = os.path.join(scratch_path("tfidf_index_r15", sf_dir), "df")
        before = sorted(
            tuple(r) for r in read_keyed_table(spark, df_dir).collect()
        )
        replay = spark.createDataFrame(
            [(TFIDF_TERMS[0], 10_000, 0)], "term string, df long, bucket int"
        )
        merge_into_table(
            spark, df_dir, replay, keys=["term"],
            when_matched_update={"df": "s.df + t.df"},
            when_not_matched_insert=True, batch_id=1,
        )
        after = sorted(
            tuple(r) for r in read_keyed_table(spark, df_dir).collect()
        )
        assert after == before

    def test_stream_maintenance_matches_inline(self, spark, sf_dir):
        """The streamed index answers exactly like the inline scan (and
        therefore like the batch-incremental index — all three share
        one oracle)."""
        from nshm2022db_spark.registry import QUERIES

        streamed = sorted(
            tuple(r)
            for r in QUERIES["stream_index_maintenance"](spark, sf_dir).collect()
        )
        inline = sorted(
            tuple(r) for r in QUERIES["tfidf_search"](spark, sf_dir).collect()
        )
        assert streamed == inline

    def test_crash_replay_of_first_batch_noops_cleanly(self, spark, tmp_path):
        """A crash after batch 0's postings commit replays the whole
        batch: the replay must neither raise (the old shared
        first-batch flag routed df into a merge on an EMPTY table) nor
        double-count (batch_id no-ops the already-landed postings)."""
        from nshm2022db_spark.extensions.curation import _index_apply_batch, _index_postings
        from nshm2022db_spark.streaming.sinks import (
            append_partition_transaction,
            read_keyed_table,
        )

        batch = spark.createDataFrame(
            [(1, "spark merge spark vector", "en", "s", 1),
             (2, "vector vector merge plan", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        clean = str(tmp_path / "clean")
        _index_apply_batch(batch, 0, f"{clean}/p", f"{clean}/d", f"{clean}/m")

        crashed = str(tmp_path / "crashed")
        # simulate the partial batch 0: ONLY the postings landed (the
        # same stat-append-only shape _index_apply_batch commits — the
        # per-batch blooms moved to the closing compaction in r15)
        append_partition_transaction(
            spark, f"{crashed}/p", "bucket", _index_postings(batch),
            stats_cols=["doc_id"], batch_id=0,
        )
        # checkpoint restart re-delivers batch 0 in full
        _index_apply_batch(batch, 0, f"{crashed}/p", f"{crashed}/d", f"{crashed}/m")

        for sub in ("p", "d", "m"):
            a = sorted(
                tuple(r) for r in read_keyed_table(spark, f"{clean}/{sub}").collect()
            )
            b = sorted(
                tuple(r) for r in read_keyed_table(spark, f"{crashed}/{sub}").collect()
            )
            assert a == b, sub

    def test_postings_carry_dl_and_meta_tracks_sum_dl(self, spark, tmp_path):
        """The BM25 length stats ride the index: every posting row of a
        doc carries its total token count, and the meta table holds the
        additive n_docs/sum_dl counters. The streaming path lands the
        counters as per-batch MOR DELTA rows (r14) — readers SUM-fold
        per metric, which this reads exactly the way the probes do."""
        from nshm2022db_spark.extensions.curation import _index_apply_batch
        from nshm2022db_spark.streaming.sinks import read_keyed_table

        def meta_folded(path):
            rows = read_keyed_table(spark, path).collect()
            out: dict[str, int] = {}
            for r in rows:
                out[r.metric] = out.get(r.metric, 0) + r.v
            return out

        batch = spark.createDataFrame(
            [(1, "spark merge spark vector", "en", "s", 1),
             (2, "vector plan", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        t = str(tmp_path / "idx")
        _index_apply_batch(batch, 0, f"{t}/p", f"{t}/d", f"{t}/m")
        dls = {
            (r.doc_id, r.dl)
            for r in read_keyed_table(spark, f"{t}/p").select("doc_id", "dl").collect()
        }
        assert dls == {(1, 4), (2, 2)}
        assert meta_folded(f"{t}/m") == {"n_docs": 2, "sum_dl": 6}
        # a second batch's deltas accumulate ADDITIVELY under the fold
        batch2 = spark.createDataFrame(
            [(3, "merge", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        _index_apply_batch(batch2, 1, f"{t}/p", f"{t}/d", f"{t}/m")
        assert meta_folded(f"{t}/m") == {"n_docs": 3, "sum_dl": 7}
        # delta generations: one meta row per (metric, batch)
        assert read_keyed_table(spark, f"{t}/m").count() == 4


class TestBm25:
    def test_stream_index_matches_inline(self, spark, sf_dir):
        """BM25 from the streaming-maintained index == the inline scan
        (they share one oracle; this pins it test-side too)."""
        from nshm2022db_spark.registry import QUERIES

        streamed = sorted(
            tuple(r) for r in QUERIES["bm25_index_stream"](spark, sf_dir).collect()
        )
        inline = sorted(
            tuple(r) for r in QUERIES["bm25_search"](spark, sf_dir).collect()
        )
        assert streamed == inline and streamed

    def test_length_normalization_and_saturation(self, spark):
        """The two properties BM25 adds over TF-IDF: at equal tf a
        SHORTER doc scores higher (length normalization), and doubling
        an already-high tf moves the score sublinearly (saturation)."""
        from nshm2022db_spark.extensions.curation import _bm25_score

        rows = spark.createDataFrame(
            # (tf0, dl): same tf different lengths; then saturating tf.
            # tf1=tf2=0 zeroes the other terms' contributions, so the
            # full 3-term score IS the single-term score.
            [(2, 10, "short"), (2, 100, "long"),
             (10, 50, "tf10"), (20, 50, "tf20"), (1, 50, "tf1"), (2, 50, "tf2")],
            "tf0 int, dl int, tag string",
        ).selectExpr(
            "tag",
            "tf0", "0 AS tf1", "0 AS tf2",
            "100 AS df0", "100 AS df1", "100 AS df2",
            "dl",
        ).selectExpr(
            "tag",
            # corpus stats: N=1000 docs, sum_dl=50000 → avgdl=50
            f"{_bm25_score('1000', '50000', '', 'dl')} AS s",
        )
        s = {r.tag: r.s for r in rows.collect()}
        assert s["short"] > s["long"] > 0
        gain_low = s["tf2"] - s["tf1"]
        gain_high = s["tf20"] - s["tf10"]
        assert gain_high < gain_low  # saturation: later occurrences add less
