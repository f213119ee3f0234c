"""Distributed classifier-evaluation primitives: ROC-AUC and
reliability tables.

A training-data pipeline that gates documents on a learned quality
score (FastText-style filters, CCNet perplexity buckets, toxicity
classifiers) needs to EVALUATE those scorers at corpus scale before
trusting them as filters. The reference exposes no ML surface
(lambda/lambda_function.py routes CRUD + aggregates only); these are
north-star extensions in the same family as ml1/ml2
(plans/q_linkage.py).

Scale shape (the repo's unpartitioned-Window policy, SCALE.md
"Round 10: the unpartitioned-Window sweep"): both operators first
reduce to PER-SCORE-GROUP aggregates — one map-side-combinable
shuffle keyed on the score — so the only ordered pass runs over the
DISTINCT score domain, which is bounded by construction for the
integer/bucketed scores these lanes use (a continuous score should be
quantized first; the AUC of a monotone transform is unchanged, so
fixed-grid quantization only coarsens tie handling).

Numeric determinism (the oracle-hash discipline): AUC is the
tie-aware Mann-Whitney statistic

    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)

with R_pos the sum of average ranks of positives. Average ranks are
half-integers, so 2*R_pos = sum(pos_s * (2*cum_before + n_s + 1)) is
an INTEGER; it is accumulated exactly in decimal(38,0) (HUGEINT on
the DuckDB side), and only the final numerator/denominator are cast
to double before one division — two correctly-rounded casts and one
IEEE division produce bit-identical doubles on any engine, so the
driver's value-hash compare is safe without any rounding fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _per_score(
    df: DataFrame, score_col: str, label_col: str, alias: str = "__s"
) -> DataFrame:
    """Shared first stage of every metric here: NULL-filtered
    (score, label) projection reduced to per-distinct-score
    (``alias``, n_s, pos_s) — the one corpus-scale shuffle, map-side
    combinable. NULL scores or labels are excluded (a row without a
    score cannot be ranked)."""
    base = df.select(
        F.col(score_col).alias(alias),
        F.col(label_col).cast("int").alias("__y"),
    ).filter(F.col(alias).isNotNull() & F.col("__y").isNotNull())
    return base.groupBy(alias).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("__y").alias("pos_s"),
    )


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One-row (n_pos, n_neg, auc): tie-aware ROC-AUC of ``score_col``
    as a ranking of the binary ``label_col`` (higher score = predicted
    positive). Equivalent to the normalized Mann-Whitney U with
    average ranks for ties — what sklearn.metrics.roc_auc_score
    computes (pinned against a numpy reference in tests/test_mleval).

    ``label_col`` may be boolean or 0/1 numeric. NULL handling per
    ``_per_score``. ``auc`` is NULL when either class is empty
    (undefined, not 0.5 — the caller should notice, not average it
    away).
    """
    per = _per_score(df, score_col, label_col)
    # Ordered pass over the DISTINCT score domain only (see module
    # docstring): cumulative count of rows with strictly smaller score.
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.withColumn(
        "cum_before", F.coalesce(F.sum("n_s").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum(
            F.col("pos_s").cast(_DEC)
            * (2 * F.col("cum_before") + F.col("n_s") + 1).cast(_DEC)
        ).alias("two_rpos"),
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).cast("long").alias("n_neg"),
    )
    num = (
        F.col("two_rpos")
        - F.col("n_pos").cast(_DEC) * (F.col("n_pos") + 1).cast(_DEC)
    ).cast("double")
    den = (
        (2 * F.col("n_pos")).cast(_DEC) * F.col("n_neg").cast(_DEC)
    ).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), num / den
        ).alias("auc"),
    )


def threshold_sweep(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Per-threshold confusion counts and operating-point metrics:
    for every distinct score s (as the decision threshold "keep rows
    with score >= s"), the exact (tp, fp, fn) plus precision, recall,
    f1, and keep_rate — the table a corpus-filter builder reads to
    pick a gate. One shuffle keyed on the score, then the bounded
    ordered pass over the DISTINCT score domain (module docstring).

    Numeric determinism: counts are exact integers; every derived
    metric is a SINGLE division of two exactly-representable integers
    (f1 via the 2tp/(2tp+fp+fn) identity — algebraically equal to the
    harmonic mean but one correctly-rounded IEEE op instead of three),
    so both engines produce bit-identical doubles and the driver hash
    needs no rounding fold. No -0.0 hazard: every quantity is >= 0.
    """
    per = _per_score(df, score_col, label_col, alias="s")
    # keep = rows with score >= s: cumulate from the top score down.
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "s",
        F.sum("pos_s").over(w).cast("long").alias("tp"),
        (F.sum(F.col("n_s") - F.col("pos_s")).over(w)).cast("long").alias("fp"),
        F.sum("pos_s").over(w_all).cast("long").alias("n_pos"),
        F.sum("n_s").over(w_all).cast("long").alias("n_total"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return cum.select(
        "s",
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        (dbl(F.col("tp")) / dbl(F.col("tp") + F.col("fp"))).alias("precision"),
        F.when(
            F.col("n_pos") > 0, dbl(F.col("tp")) / dbl(F.col("n_pos"))
        ).alias("recall"),
        (
            dbl(2 * F.col("tp"))
            / dbl(F.col("tp") + F.col("fp") + F.col("n_pos"))
        ).alias("f1"),
        (dbl(F.col("tp") + F.col("fp")) / dbl(F.col("n_total"))).alias(
            "keep_rate"
        ),
    )


def pr_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One row (n_pos, n_neg, ap): average precision — the area under
    the precision-recall curve by the step-interpolation rule
    AP = sum_k (dTP_k / n_pos) * P_k over distinct thresholds in
    DESCENDING score order (ties grouped, the
    sklearn.metrics.average_precision_score definition; pinned
    against a numpy reference in tests). For the imbalanced regimes a
    corpus filter usually lives in, AP is the more honest scalar than
    ROC-AUC (ml3), which a flood of easy negatives inflates.

    Determinism: each term is a few exact-integer casts and IEEE ops;
    the SUM accumulates through an ORDERED running-window frame, so
    both engines perform the identical sequence of additions
    (the w14 EWMA precedent) — no rounding fold needed. NULL when no
    positives (undefined, not 0)."""
    per = _per_score(df, score_col, label_col)
    w = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "__s",
        F.sum("pos_s").over(w).cast("long").alias("tp"),
        F.sum("n_s").over(w).cast("long").alias("kept"),
        F.sum("pos_s").over(w_all).cast("long").alias("n_pos"),
        F.sum("n_s").over(w_all).cast("long").alias("n_total"),
        F.col("pos_s").cast("long").alias("d_tp"),
    )
    # the n_pos > 0 guard must wrap the TERM (when() evaluates its
    # branch lazily), not just the outer sum — ANSI mode errors on any
    # divide-by-zero, and window-aggregate inputs evaluate per row
    # before the outer projection's when() can skip them
    term = F.when(
        F.col("n_pos") > 0,
        (F.col("d_tp").cast("double") / F.col("n_pos").cast("double"))
        * (F.col("tp").cast("double") / F.col("kept").cast("double")),
    ).otherwise(F.lit(0.0))
    # Spark's UNBOUNDED PRECEDING..CURRENT frame accumulates row-at-a-
    # time in frame order; the oracle restates the same sequential add
    # chain as a recursive CTE (the w14 EWMA pattern) because a
    # windowed FLOAT sum's association order is otherwise an engine
    # implementation detail. The integer tp/kept window sums above
    # need no such care — integer addition is associative.
    scanned = cum.select(
        "__s",
        "n_pos",
        (F.col("n_total") - F.col("n_pos")).alias("n_neg"),
        F.when(F.col("n_pos") > 0, F.sum(term).over(w)).alias("__ap"),
    )
    # the fully-accumulated row is the lowest threshold
    return scanned.orderBy(F.asc("__s")).limit(1).select(
        "n_pos", "n_neg", F.col("__ap").alias("ap")
    )


def best_operating_point(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One row: the threshold that maximizes F1, lowest threshold on
    exact-double ties (ties CAN happen — e.g. a run of thresholds
    adding only negatives below the last positive keeps tp/fn fixed
    while f1 strictly falls, but distinct scores with equal (tp,fp)
    never arise; the tie-break still pins the order for safety).
    Deterministic across engines because f1 is bit-identical (see
    threshold_sweep)."""
    sweep = threshold_sweep(df, score_col, label_col)
    return sweep.orderBy(F.desc("f1"), F.asc("s")).limit(1)


def score_reliability(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability table: equal-width bins over the score range with
    per-bin (n_rows, avg_score, frac_pos) — the monotonicity /
    calibration view of a scorer (does P(label | score bin) actually
    rise with the score?). Binning is pure integer-free arithmetic on
    (score - min) * n_bins / (max - min): both engines evaluate the
    same rational expression, and the floor lands identically except
    exactly ON a bin edge, which the half-open [lo, hi) rule plus the
    max-score clamp makes deterministic.

    avg_score is ROUNDed and can be a tiny SIGNED mean → zero-folded
    (+0.0) per the repo's IEEE -0.0 oracle rule (tests/oracle.py).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    ext = base.agg(
        F.min("__s").alias("lo"), F.max("__s").alias("hi")
    )
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.when(
            F.col("hi") == F.col("lo"), F.lit(0)
        )
        .otherwise(
            F.least(
                F.floor(
                    (F.col("__s") - F.col("lo"))
                    * n_bins
                    / (F.col("hi") - F.col("lo"))
                ),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
        .alias("bin"),
        "__s",
        "__y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.round(F.avg("__s"), 4) + F.lit(0.0)).alias("avg_score"),
            (F.round(F.avg("__y"), 4) + F.lit(0.0)).alias("frac_pos"),
        )
        .orderBy("bin")
    )
