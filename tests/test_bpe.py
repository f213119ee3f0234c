"""BPE tokenizer lane: fold-vs-model equivalence and end-to-end
training parity against an independent pure-Python reference."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions import bpe


# --- independent pure-Python BPE reference (model) ---


def py_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_train(word_freq: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    syms = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # argmax with (left, right) lexicographic tie-break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((left, right, freq))
        syms = {w: py_merge(s, left, right) for w, s in syms.items()}
    return merges


def py_encode_count(text: str, merges: list[tuple[str, str]]) -> int:
    n = 0
    for w in text.strip().lower().split():
        s = list(w)
        for left, right in merges:
            s = py_merge(s, left, right)
        n += len(s)
    return n


# --- fold ≡ model (property) ---

_word = st.text(alphabet="abcd", min_size=1, max_size=12)


@settings(max_examples=20, deadline=None)
@given(st.lists(_word, min_size=1, max_size=8), st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "cd"]))
def test_merge_fold_matches_model(spark, words, left, right):
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = [
        r["m"]
        for r in df.select(
            bpe.merge_pair(bpe.chars(F.col("w")), left, right).alias("m")
        ).collect()
    ]
    want = [py_merge(list(w), left, right) for w in words]
    assert got == want


def test_train_matches_model_on_corpus(spark, sf_smoke):
    from aws_csp_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_smoke, "documents")
    wf = bpe.word_freqs(d)
    spark_merges = bpe.train_bpe(wf, 6)
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    assert spark_merges == py_train(word_freq, 6)
    assert len(spark_merges) == 6  # corpus is big enough to find 6


def test_batched_training_matches_sequential(spark, sf_smoke):
    """Multi-merge batching (the frequency-gap trick) must change the
    driver round count, never the model: batch_size=8 yields the exact
    merge list of batch_size=1 (which is itself pinned to the pure-
    Python reference above) in strictly fewer collect() rounds."""
    from aws_csp_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_smoke, "documents")
    wf = bpe.word_freqs(d).persist()
    seq_stats: dict = {}
    bat_stats: dict = {}
    seq = bpe.train_bpe(wf, 12, batch_size=1, stats=seq_stats)
    bat = bpe.train_bpe(wf, 12, batch_size=8, stats=bat_stats)
    wf.unpersist()
    assert bat == seq
    assert len(seq) == 12
    assert seq_stats["rounds"] == 12 + 1 or seq_stats["rounds"] == 12
    assert bat_stats["rounds"] < seq_stats["rounds"]


@settings(max_examples=8, deadline=None)
@given(st.lists(_word, min_size=2, max_size=20), st.integers(0, 6))
def test_batched_training_matches_model_property(spark, words, n):
    """Property: on arbitrary tiny corpora the batched trainer still
    equals the pure-Python sequential reference merge-for-merge."""
    freq = Counter(words)
    wf = spark.createDataFrame(list(freq.items()), "word string, freq long")
    got = bpe.train_bpe(wf, n, batch_size=4)
    assert got == py_train(dict(freq), n)


def test_batched_training_tie_regression(spark):
    """The round-7 review counterexample: {'arw': 10, 'bb': 10}. The
    original scanned-rows-only bound accepted (b,b) into (a,r)'s
    batch because the conflicting tie (r,w) sat BELOW it in the sort;
    sequential greedy instead merges (a,r), sees the respawned
    (ar,w) at freq 10, and 'ar' wins the lexicographic tie against
    'b'. The corrected 2x-bound rule must close the batch after
    (a,r) and reproduce the sequential order exactly."""
    wf = spark.createDataFrame([("arw", 10), ("bb", 10)], "word string, freq long")
    want = py_train({"arw": 10, "bb": 10}, 3)
    assert bpe.train_bpe(wf, 3, batch_size=8) == want
    assert [m[:2] for m in want] == [("a", "r"), ("ar", "w"), ("b", "b")]


def test_train_bpe_rejects_nonpositive_batch(spark):
    """batch_size < 1 would loop forever re-collecting identical
    counts; it must fail fast instead."""
    import pytest as _pytest

    wf = spark.createDataFrame([("ab", 5)], "word string, freq long")
    with _pytest.raises(ValueError):
        bpe.train_bpe(wf, 1, batch_size=0)


def test_encode_matches_model(spark, sf_smoke):
    from aws_csp_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_smoke, "documents").limit(40)
    wf = bpe.word_freqs(d)
    merges = [(l, r) for l, r, _ in bpe.train_bpe(wf, 5)]
    got = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id",
            bpe.encode_token_count(F.col("text"), merges).alias("n"),
        ).collect()
    }
    want = {
        r["doc_id"]: py_encode_count(r["text"], merges)
        for r in d.select("doc_id", "text").collect()
    }
    assert got == want


def test_encode_edge_cases(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a",), (None,)], "text STRING")
    rows = df.select(
        bpe.encode_token_count(F.col("text"), [("a", "a")]).alias("n")
    ).collect()
    assert [r["n"] for r in rows] == [0, 0, 1, 0]


def test_merges_are_compressive(spark, sf_smoke):
    """Encoding under the learned merges must not exceed the raw
    character count and must strictly compress a corpus that has
    repeated pairs."""
    from aws_csp_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_smoke, "documents").limit(60)
    merges = [(l, r) for l, r, _ in bpe.train_bpe(bpe.word_freqs(d), 4)]
    agg = d.select(
        bpe.encode_token_count(F.col("text"), merges).alias("n_bpe"),
        F.length(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")).alias(
            "n_chars"
        ),
    ).agg(F.sum("n_bpe").alias("b"), F.sum("n_chars").alias("c")).collect()[0]
    assert agg["b"] < agg["c"]


def test_pipe5_packing_invariants(spark, sf_smoke):
    """pipe5 bins are exclusive-prefix-sum packings: per (lang, bin)
    the running total entering the bin is below the budget boundary,
    bin ids are contiguous from 0 per shard, and totals reconcile
    with an independent replay of the packing rule."""
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions import bpe
    from aws_csp_datapipeline_spark.plans.q_tokenize import (
        pipe5_tokenized_packing,
    )

    got = {
        (r["lang"], r["bin_id"]): (r["n_docs"], r["total_tokens"])
        for r in pipe5_tokenized_packing(spark, sf_smoke).collect()
    }
    # independent replay: python greedy over (lang, doc_id)-ordered counts
    d = load_table(spark, sf_smoke, "documents")
    merges = [(l, r) for l, r, _ in bpe.train_bpe(bpe.word_freqs(d), 8)]
    rows = d.select("lang", "doc_id", "text").collect()
    per_doc = sorted(
        (r["lang"], r["doc_id"], py_encode_count(r["text"], merges))
        for r in rows
    )
    want: dict = {}
    run: dict = {}
    for lang, _doc, n in per_doc:
        cum = run.get(lang, 0)
        b = cum // 2048
        run[lang] = cum + n
        docs, tot = want.get((lang, b), (0, 0))
        want[(lang, b)] = (docs + 1, tot + n)
    assert got == want
    for lang in {k[0] for k in got}:
        bins = sorted(b for (l, b) in got if l == lang)
        assert bins == list(range(len(bins)))  # contiguous from 0


def test_ewma_null_poisons_group_like_oracle(spark):
    """A NULL value must make that row's EWMA and every later row in
    the group NULL — matching the recursive-CTE oracle's
    α·NULL + (1−α)·y algebra. (Guards the engine lane against
    NaN-skipping shortcuts like pandas ewm.)"""
    from aws_csp_datapipeline_spark.functions.grouped import ewma_per_group

    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, None), (3, 1, 5.0), (4, 2, 7.0), (5, 2, 7.0)],
        "event_id long, user_id long, value double",
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma_per_group(
            df, "user_id", ["event_id"], "value", "event_id"
        ).collect()
    }
    assert got[1] == 10.0
    assert got[2] is None and got[3] is None  # poisoned tail
    assert got[4] == 7.0 and got[5] == 7.0  # repeated value stays exact
