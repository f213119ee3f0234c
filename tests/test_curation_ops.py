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
