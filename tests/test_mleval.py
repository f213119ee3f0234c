"""mleval: tie-aware ROC-AUC pinned against a numpy average-rank
reference; reliability table on hand-checkable fixtures. (The
registry oracle replays ml3/ml4 against DuckDB at sf0.01.)"""

import numpy as np
import pytest

from aws_csp_datapipeline_spark.functions.mleval import (
    roc_auc,
    score_reliability,
)


def _auc_ref(scores, labels):
    """Mann-Whitney AUC with average ranks for ties — the
    sklearn.metrics.roc_auc_score definition, in ~15 lines."""
    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=int)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    ss = s[order]
    i, r = 0, 1
    while i < len(s):
        j = i
        while j < len(s) and ss[j] == ss[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (
        n_pos * n_neg
    )


def _df(spark, scores, labels):
    return spark.createDataFrame(
        list(zip(map(float, scores), map(int, labels))),
        "score double, label int",
    )


def test_roc_auc_matches_numpy_reference_with_ties(spark):
    rng = np.random.default_rng(42)
    scores = rng.integers(0, 25, size=400)  # heavy ties
    # labels correlated with score so AUC is non-trivial
    labels = (scores + rng.integers(0, 20, size=400) > 22).astype(int)
    assert 0 < labels.sum() < 400
    row = roc_auc(_df(spark, scores, labels), "score", "label").collect()[0]
    want = _auc_ref(scores, labels)
    assert row["n_pos"] == int(labels.sum())
    assert row["n_neg"] == int(400 - labels.sum())
    assert row["auc"] == pytest.approx(want, abs=1e-12)


def test_roc_auc_perfect_and_inverted(spark):
    scores = [1, 2, 3, 4, 5, 6]
    labels = [0, 0, 0, 1, 1, 1]
    assert (
        roc_auc(_df(spark, scores, labels), "score", "label").collect()[0][
            "auc"
        ]
        == 1.0
    )
    assert (
        roc_auc(_df(spark, scores, labels[::-1]), "score", "label")
        .collect()[0]["auc"]
        == 0.0
    )
    # all-tied scores carry no information: AUC exactly 0.5
    assert (
        roc_auc(_df(spark, [7] * 6, labels), "score", "label").collect()[0][
            "auc"
        ]
        == 0.5
    )


def test_roc_auc_single_class_is_null_and_nulls_excluded(spark):
    row = roc_auc(_df(spark, [1, 2, 3], [1, 1, 1]), "score", "label").collect()[
        0
    ]
    assert row["auc"] is None and row["n_neg"] == 0
    df = spark.createDataFrame(
        [(1.0, 1), (None, 0), (2.0, None), (0.5, 0)],
        "score double, label int",
    )
    row = roc_auc(df, "score", "label").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (1, 1)
    assert row["auc"] == 1.0


def test_score_reliability_known_bins(spark):
    # scores 0..9 with n_bins=10 -> one bin each; label = score >= 5
    scores = list(range(10))
    labels = [int(s >= 5) for s in scores]
    rows = score_reliability(
        _df(spark, scores, labels), "score", "label", n_bins=10
    ).collect()
    assert [r["bin"] for r in rows] == list(range(10))
    assert all(r["n_rows"] == 1 for r in rows)
    assert [r["frac_pos"] for r in rows] == [0.0] * 5 + [1.0] * 5
    # max score lands in the LAST bin (clamped), not a phantom 11th
    assert rows[-1]["avg_score"] == 9.0


def test_score_reliability_degenerate_and_validation(spark):
    rows = score_reliability(
        _df(spark, [3, 3, 3], [0, 1, 1]), "score", "label", n_bins=4
    ).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0
    assert rows[0]["frac_pos"] == pytest.approx(0.6667)
    with pytest.raises(ValueError, match="n_bins"):
        score_reliability(_df(spark, [1], [1]), "score", "label", n_bins=0)


def test_threshold_sweep_matches_bruteforce(spark):
    from aws_csp_datapipeline_spark.functions.mleval import threshold_sweep

    rng = np.random.default_rng(7)
    scores = rng.integers(0, 15, size=300)
    labels = (scores + rng.integers(0, 12, size=300) > 13).astype(int)
    rows = threshold_sweep(_df(spark, scores, labels), "score", "label").collect()
    n_pos = int(labels.sum())
    assert len(rows) == len(set(scores.tolist()))
    for r in rows:
        keep = scores >= r["s"]
        tp = int(labels[keep].sum())
        fp = int(keep.sum() - tp)
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, n_pos - tp)
        assert r["precision"] == tp / (tp + fp)
        assert r["recall"] == tp / n_pos
        assert r["f1"] == 2 * tp / (2 * tp + fp + (n_pos - tp))
        assert r["keep_rate"] == keep.sum() / 300
    # thresholds descend in recall order: tp monotone non-decreasing
    by_s = sorted(rows, key=lambda r: -r["s"])
    assert all(a["tp"] <= b["tp"] for a, b in zip(by_s, by_s[1:]))


def test_best_operating_point_argmax_and_tiebreak(spark):
    from aws_csp_datapipeline_spark.functions.mleval import (
        best_operating_point,
        threshold_sweep,
    )

    rng = np.random.default_rng(11)
    scores = rng.integers(0, 15, size=300)
    labels = (scores + rng.integers(0, 12, size=300) > 13).astype(int)
    df = _df(spark, scores, labels)
    sweep = threshold_sweep(df, "score", "label").collect()
    best = best_operating_point(df, "score", "label").collect()
    assert len(best) == 1
    want = min(sweep, key=lambda r: (-r["f1"], r["s"]))
    assert (best[0]["s"], best[0]["f1"]) == (want["s"], want["f1"])


def test_threshold_sweep_no_positives_recall_null(spark):
    from aws_csp_datapipeline_spark.functions.mleval import threshold_sweep

    rows = threshold_sweep(
        _df(spark, [1, 2, 3], [0, 0, 0]), "score", "label"
    ).collect()
    assert all(r["recall"] is None for r in rows)
    assert all(r["tp"] == 0 and r["precision"] == 0.0 for r in rows)


def test_ml7_quality_scorer_auc_structure(spark):
    """ml7 asks whether t2's quality score ranks 'en' documents above
    the rest; on the synthetic corpus the answer is "no signal"
    (AUC ~0.495 — all languages draw from one quality distribution),
    which is the finding the lane exists to surface. Pin the
    mechanics here (class counts, AUC near chance, not degenerate);
    the DuckDB hash replay pins the exact value."""
    from aws_csp_datapipeline_spark.plans.q_linkage import ml7_scorer_auc

    row = ml7_scorer_auc(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["n_pos"] > 0 and row["n_neg"] > 0
    assert row["n_pos"] + row["n_neg"] == 500
    assert 0.4 < row["auc"] < 0.6  # near chance, but a real number


def _ap_ref(scores, labels):
    """Average precision, step rule with ties grouped (the
    sklearn.metrics.average_precision_score definition)."""
    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=int)
    n_pos = int(y.sum())
    ap, tp, kept = 0.0, 0, 0
    for t in sorted(set(s.tolist()), reverse=True):
        at = s == t
        d_tp = int(y[at].sum())
        tp += d_tp
        kept += int(at.sum())
        ap += (d_tp / n_pos) * (tp / kept)
    return ap


def test_pr_auc_matches_numpy_reference(spark):
    from aws_csp_datapipeline_spark.functions.mleval import pr_auc

    rng = np.random.default_rng(23)
    scores = rng.integers(0, 30, size=500)
    labels = (scores + rng.integers(0, 25, size=500) > 27).astype(int)
    assert 0 < labels.sum() < 500
    row = pr_auc(_df(spark, scores, labels), "score", "label").collect()[0]
    assert row["n_pos"] == int(labels.sum())
    assert row["auc" if "auc" in row.asDict() else "ap"] == pytest.approx(
        _ap_ref(scores, labels), abs=1e-12
    )


def test_pr_auc_perfect_and_no_positives(spark):
    from aws_csp_datapipeline_spark.functions.mleval import pr_auc

    # perfect ranking: AP = 1.0 exactly
    row = pr_auc(
        _df(spark, [1, 2, 3, 4], [0, 0, 1, 1]), "score", "label"
    ).collect()[0]
    assert row["ap"] == 1.0
    # no positives: NULL, one row
    rows = pr_auc(_df(spark, [1, 2], [0, 0]), "score", "label").collect()
    assert len(rows) == 1 and rows[0]["ap"] is None
