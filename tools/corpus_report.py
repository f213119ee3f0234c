"""One-command corpus governance report.

Runs the engine's corpus-analysis battery over a test-data directory
and writes a markdown report — the artifact a data-curation team
reviews before promoting a crawl batch into a training mix:

  python tools/corpus_report.py [sf_dir] [out.md]

Sections: corpus profile (dq1), token/quality stats (t1/t2 rollup),
language mix (t3), vocabulary health (t21 hapax share, t22 growth
tail), duplication (d1 survivors, d8 per-source redundancy, d11
cross-source overlap), skew/layout pre-flight (dq12, dq14). Every
number comes from the same registry queries the driver attests, so
the report is exactly as trustworthy as the correctness gate.
All queries run lazily off one SparkSession; total cost is a handful
of corpus scans (the dedup section dominates).
"""

from __future__ import annotations

import os
import sys


def _fmt_rows(df, limit=12):
    rows = df.limit(limit).collect()
    if not rows:
        return "_(no rows)_\n"
    cols = df.columns
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORPUS_REPORT.md"

    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    from aws_csp_datapipeline_spark.plans import registry
    from aws_csp_datapipeline_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="corpus_report")
    qs = registry.queries()

    def q(name):
        return qs[name](spark, sf_dir)

    sections: list[tuple[str, str]] = []

    tok = q("t1_token_stats").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens"),
    ).collect()[0]
    docs_total = tok["n_docs"]
    qual = q("t2_quality_score").agg(
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.min("quality"), 4).alias("min_quality"),
    ).collect()[0]
    sections.append(
        (
            "Corpus profile",
            f"- documents: **{docs_total}**\n"
            f"- total tokens: **{tok['total_tokens']}** "
            f"(avg {tok['avg_tokens']}/doc)\n"
            f"- quality score: avg **{qual['avg_quality']}**, "
            f"min {qual['min_quality']}\n",
        )
    )

    sections.append(
        (
            "Language mix (marker lang-ID)",
            # deterministic row choice: order before the display limit
            _fmt_rows(q("t3_lang_id_confusion").orderBy("lang", "pred_lang")),
        )
    )

    fof = {r["freq"]: r["n_types"] for r in q("t21_freq_of_freq").collect()}
    vocab_rows = q("t22_vocab_growth").collect()
    vocab_size = vocab_rows[-1]["vocab_size"] if vocab_rows else 0
    tail_new = vocab_rows[-1]["new_types"] if vocab_rows else 0
    hapax = fof.get(1, 0)
    sections.append(
        (
            "Vocabulary health",
            f"- vocabulary size: **{vocab_size}** types\n"
            f"- hapax (freq=1) types: **{hapax}** "
            f"({round(100 * hapax / max(1, vocab_size), 1)}% — high values "
            f"suggest OCR noise or open-ended entity text)\n"
            f"- new types in the final ingestion bucket: {tail_new} "
            f"(0 ⇒ the crawl stopped finding new language)\n",
        )
    )

    kept = q("d1_exact_dedup").count()
    sections.append(
        (
            "Duplication",
            f"- exact-dedup survivors: **{kept}** of {docs_total} "
            f"({round(100 * (docs_total - kept) / max(1, docs_total), 1)}% exact dups)\n\n"
            "Per-source redundancy (near-dup, non-canonical share):\n\n"
            + _fmt_rows(
                q("d8_redundancy_by_source").orderBy(
                    F.desc("redundancy_rate"), F.asc("source")
                ),
                8,
            )
            + "\nCross-source identical-document overlap (top pairs):\n\n"
            + _fmt_rows(q("d11_cross_source_dups"), 8),
        )
    )

    # Passage duplication: the sub-document repeat mass (d9 audit)
    # and what the d14 scrub would actually remove — the number a
    # curation team weighs before running the removal pass.
    scrub = q("d14_passage_scrubbed_corpus").agg(
        F.sum("n_removed_spans").alias("spans_removed"),
        F.sum((F.col("n_removed_spans") > 0).cast("int")).alias("docs_touched"),
    ).collect()[0]
    psg = q("d9_duplicate_passages").agg(
        F.sum("n_spans").alias("n_spans"),
        F.sum("n_dup_spans").alias("n_dup_spans"),
    ).collect()[0]
    sections.append(
        (
            "Passage duplication",
            f"- 10-token spans audited: **{psg['n_spans']}**, in a "
            f"duplicated pile: **{psg['n_dup_spans']}**\n"
            f"- d14 scrub effect: **{scrub['spans_removed']}** span "
            f"occurrences removed across **{scrub['docs_touched']}** "
            f"documents (canonical first occurrences kept)\n",
        )
    )

    # Near-dup banding: is the half-cost LSH lane (k=30, b=10, r=3 —
    # ~2x cheaper banding join) safe for THIS corpus? Computed from
    # the verified default-banding pair set (r=2 recall 1-8e-8 at the
    # threshold ≈ ground truth); see functions/dedup.py
    # banding_recommendation for the per-pair miss model.
    from aws_csp_datapipeline_spark.functions.dedup import banding_recommendation

    rec = banding_recommendation(q("d3_minhash_lsh_pairs")).collect()[0]
    sections.append(
        (
            "Near-dup banding",
            f"- verified near-dup pairs: **{rec['n_pairs']}** "
            f"({rec['n_boundary']} boundary pairs with J < 0.9)\n"
            f"- expected pairs LOST under half-cost banding: "
            f"**{rec['expected_misses']}**\n"
            f"- recommendation: **`banding='{rec['recommended_banding']}'`** "
            f"(pass to the d3/d6/d7/d8/tt12 plan entries or "
            f"`dedup.minhash_lsh_pairs`)\n",
        )
    )

    # Scorer evaluation: BEFORE gating a corpus on a learned/heuristic
    # quality score, measure whether the score separates anything —
    # here t2's composite quality vs the lang='en' label (ml7's
    # question), plus the full operating point the sweep recommends.
    # An AUC near 0.5 (this synthetic corpus) means a quality gate
    # would NOT skew the language mix — worth knowing either way.
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions.mleval import (
        best_operating_point,
        pr_auc,
        roc_auc,
    )
    from aws_csp_datapipeline_spark.functions.text import quality_score

    def _r(x, nd=4):
        # metrics are NULL on degenerate labels (mleval contract:
        # "the caller should notice") — the report must say so, not
        # crash in round()
        return "undefined (one-class label)" if x is None else round(x, nd)

    # ONE regex-heavy quality_score scan feeds all three metrics (the
    # same projection ml7_scorer_auc attests; roc_auc(scored) ==
    # the ml7 lane by construction)
    scored = load_table(spark, sf_dir, "documents").select(
        F.floor(quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s"),
        (F.col("lang") == F.lit("en")).alias("y"),
    ).persist()
    try:
        auc = roc_auc(scored, "s", "y").collect()[0]
        ap = pr_auc(scored, "s", "y").collect()[0]
        bop_rows = best_operating_point(scored, "s", "y").collect()
    finally:
        scored.unpersist()
    gate = (
        f"- best-F1 gate: quality >= **{bop_rows[0]['s'] / 10000}** → "
        f"precision {_r(bop_rows[0]['precision'], 3)}, "
        f"recall {_r(bop_rows[0]['recall'], 3)}, "
        f"keeps {_r(100 * bop_rows[0]['keep_rate'], 1)}% of the corpus\n"
        if bop_rows
        else "- best-F1 gate: undefined (empty corpus)\n"
    )
    sections.append(
        (
            "Scorer evaluation (t2 quality vs lang='en')",
            f"- ROC-AUC (= the attested ml7 lane): **{_r(auc['auc'])}** "
            f"({auc['n_pos']} pos / {auc['n_neg']} neg; "
            f"~0.5 ⇒ the quality gate is language-neutral on this corpus)\n"
            f"- PR-AUC (average precision): **{_r(ap['ap'])}** "
            f"(baseline = prevalence "
            f"{round(ap['n_pos'] / max(1, ap['n_pos'] + ap['n_neg']), 4)})\n"
            + gate,
        )
    )

    # Scaling-law subsets: the nested geometric carve-out sizes a
    # scaling-law experiment would train on (tt19).
    sizes = (
        q("tt19_scaling_law_subsets")
        .groupBy("subset_id")
        .count()
        .orderBy("subset_id")
        .collect()
    )
    cum = 0
    lines = []
    for r in sizes:
        if r["subset_id"] is None:
            continue
        cum += r["count"]
        lines.append(
            f"- subset {r['subset_id']} "
            f"(target {round(100 * (1 / 64) * 2 ** r['subset_id'], 1)}%): "
            f"**{cum}** docs cumulative"
        )
    sections.append(
        ("Scaling-law subsets (nested)", "\n".join(lines) + "\n")
    )

    sections.append(
        (
            "Pre-flight diagnostics",
            "Shuffle-key skew (lineitem supplier key, top loads):\n\n"
            + _fmt_rows(q("dq12_skew_profile"), 5)  # already ordered by load
            + "\nFile-layout manifest (lineitem):\n\n"
            + _fmt_rows(q("dq14_file_manifest"), 8),
        )
    )

    body = [f"# Corpus report — `{sf_dir}`", ""]
    for title, content in sections:
        body += [f"## {title}", "", content, ""]
    with open(out_path, "w") as f:
        f.write("\n".join(body))
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    main()
