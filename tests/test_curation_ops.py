"""Behavioral tests for the round-9 curation additions: containment
dedup (the Jaccard blind spot), shingle-novelty (memorization audit),
and DSIR importance weights — each on a PLANTED corpus where the
operator's defining property is checkable by construction, not just
oracle-matched on the synthetic tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions import dedup as D
from aws_csp_datapipeline_spark.functions import sampling as SMP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def containment_corpus(spark):
    """doc 1 is verbatim-embedded in the much longer doc 2 (containment
    1.0, Jaccard far below any dedup cutoff); docs 3/4 are unrelated."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    return _docs(
        spark,
        [
            (1, short),
            (2, filler + " " + short + " " + filler.replace("w", "v")),
            (3, "totally different words here only once"),
            (4, "another unrelated document with its own words"),
        ],
    )


def test_containment_catches_what_jaccard_misses(containment_corpus):
    pairs = D.containment_pairs(
        containment_corpus, "text", "doc_id", threshold=0.9, n=3
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # the SMALL doc is reported first, fully contained in the big one
    assert (p["doc_small"], p["doc_big"]) == (1, 2)
    assert p["containment"] == 1.0
    # and a symmetric Jaccard-0.8 dedup would have missed this pair
    assert p["jaccard"] < 0.8
    j = D.ngram_jaccard_pairs(
        containment_corpus, "text", "doc_id", threshold=0.8, n=3
    ).collect()
    assert j == []


def test_containment_threshold_excludes_partial_overlap(spark):
    # only 2 of doc 5's 4 shingles occur in doc 6 -> containment 0.5
    df = _docs(
        spark,
        [
            (5, "a b c d e f"),
            (6, "a b c d zz qq rr ss tt uu vv ww"),
        ],
    )
    assert (
        D.containment_pairs(df, "text", "doc_id", threshold=0.9, n=3).count()
        == 0
    )


# ---------------------------------------------------------------------
# shingle_novelty_stats
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def novelty_corpus(spark):
    """doc 10 is original; doc 11 restates doc 10 verbatim (novelty 0);
    doc 12 is half doc-10 text, half new (novelty ~0.5); doc 13 is too
    short to shingle and must DROP."""
    base = "one two three four five six seven eight nine ten eleven twelve"
    fresh = "red orange yellow green blue indigo violet amber cyan teal navy plum"
    return _docs(
        spark,
        [
            (10, base),
            (11, base),
            (12, base + " " + fresh),
            (13, "too short"),
        ],
    )


def test_novelty_planted_fractions(novelty_corpus):
    out = {
        r["doc_id"]: r
        for r in D.shingle_novelty_stats(
            novelty_corpus, "text", "doc_id", n=8
        ).collect()
    }
    assert set(out) == {10, 11, 12}  # doc 13 has no 8-gram shingles
    assert out[10]["novelty"] == 1.0  # first occurrence of everything
    assert out[11]["novelty"] == 0.0  # verbatim restatement of doc 10
    # doc 12: 17 shingles total; the 5 pure-base ones were seen in
    # doc 10, the 12 spanning/fresh ones are new
    assert out[12]["n_shingles"] == 17
    assert out[12]["n_novel"] == 12
    assert 0.0 < out[12]["novelty"] < 1.0


def test_novelty_hashed_variant_matches_exact(novelty_corpus):
    exact = sorted(
        map(
            tuple,
            D.shingle_novelty_stats(
                novelty_corpus, "text", "doc_id", n=8
            ).collect(),
        )
    )
    hashed = sorted(
        map(
            tuple,
            D.shingle_novelty_stats(
                novelty_corpus, "text", "doc_id", n=8, hashed=True
            ).collect(),
        )
    )
    assert exact == hashed


# ---------------------------------------------------------------------
# dsir_logweights
# ---------------------------------------------------------------------

def test_dsir_weights_tilt_toward_target(spark):
    """Target-vocabulary docs must out-weigh off-target docs: the whole
    point of the importance weight. Corpus: 20 'wiki-like' target docs
    sharing one vocabulary, 20 proposal-only docs sharing another, and
    one probe doc of each flavor scored OUT of the target set."""
    rows = []
    for i in range(20):
        rows.append((i, "science history culture theory method result", "en"))
    for i in range(20, 40):
        rows.append((i, "buy cheap click here free offer now", "xx"))
    # probes: same text, both tagged off-target so only CONTENT drives
    # their weights
    rows.append((100, "science history culture theory method result", "xx"))
    rows.append((101, "buy cheap click here free offer now", "xx"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in SMP.dsir_logweights(
            df, "text", "doc_id", target=F.col("lang") == "en", buckets=1024
        ).collect()
    }
    assert out[100] > out[101]  # target-flavored probe wins
    # and the planted target docs dominate the planted proposal docs
    assert min(out[i] for i in range(20)) > max(out[i] for i in range(20, 40))


def test_dsir_empty_docs_drop_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "", False), (3, "   ", False)],
        "doc_id long, text string, tgt boolean",
    )
    rows = SMP.dsir_logweights(
        df, "text", "doc_id", target=F.col("tgt"), buckets=64
    ).collect()
    assert [(r["doc_id"], r["n_tokens"]) for r in rows] == [(1, 3)]


# ---------------------------------------------------------------------
# scrub_duplicate_passages (d14)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def passage_corpus(spark):
    """doc 1 owns the 10-token passage; doc 2 repeats it verbatim in
    the middle of otherwise-unique text; doc 3 is untouched; doc 4 is
    shorter than one span width."""
    passage = " ".join(f"p{i}" for i in range(10))  # exactly one tile
    d2_head = " ".join(f"a{i}" for i in range(10))
    d2_tail = "tail1 tail2 tail3"
    return _docs(
        spark,
        [
            (1, passage),
            (2, d2_head + " " + passage + " " + d2_tail),
            (3, " ".join(f"u{i}" for i in range(20))),
            (4, "too short for spans"),
        ],
    )


def test_scrub_removes_repeat_keeps_canonical(passage_corpus):
    out = {
        r["doc_id"]: (r["text"], r["n_removed_spans"])
        for r in D.scrub_duplicate_passages(
            passage_corpus, "text", "doc_id"
        ).collect()
    }
    passage = " ".join(f"p{i}" for i in range(10))
    # canonical first occurrence (doc 1, pos 0) survives verbatim
    assert out[1] == (passage, 0)
    # doc 2's repeat is excised; its own tokens (head tile + sub-width
    # tail) survive in order
    assert out[2] == (
        " ".join(f"a{i}" for i in range(10)) + " tail1 tail2 tail3",
        1,
    )
    # untouched and sub-width docs pass through verbatim
    assert out[3] == (" ".join(f"u{i}" for i in range(20)), 0)
    assert out[4] == ("too short for spans", 0)


def test_scrub_within_doc_repeat(spark):
    """A doc repeating its own tile keeps only the first copy."""
    tile = " ".join(f"q{i}" for i in range(10))
    df = _docs(spark, [(7, tile + " " + tile + " " + tile)])
    row = D.scrub_duplicate_passages(df, "text", "doc_id").collect()[0]
    assert row["text"] == tile
    assert row["n_removed_spans"] == 2
