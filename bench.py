"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (count() action → all partitions
materialize) and timed after a warm-up of the session + parquet
footer reads.

Single-run timings at this scale are dominated by machine noise: three
back-to-back runs of identical round-4 code on this host totalled
33.0 / 40.4 / 39.8 s (±20 %), with per-query swings up to 65 % on
queries whose code had not changed (see SCALE.md "Bench variance").
Each query therefore runs $SPARK_GRAFT_BENCH_REPS times (default 3)
and reports the per-query MIN — the capability number, stable across
runs — plus the per-query MEDIAN (``queries_median``; the
expected-case number) and per-rep totals so the spread stays visible.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


HEADLINE = [
    "q1_pricing_summary",
    "a5_group_count_2key",
    "j2_star_agg",
    "o3_topk",
    "p9_exists_semijoin",
    "w1_topk_per_group",
    "w3_sessionize",
    "m7_dedup_by_keys",
    "t1_token_stats",
    "t2_quality_score",
    "d1_exact_dedup",
    "d3_minhash_lsh_pairs",
    "d9_duplicate_passages",
    "d10_semdedup",
    "inc3_incremental_semdedup",
    "s1_cosine_topk",
    "s2_knn_join",
    "st2_windowed_counts",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "x1_asof_join",
    "x2_interval_join",
    "g3_time_rollup",
    "q9_profit_by_nation_year",
    "g4_grouping_sets",
    "w5_rank_battery",
    "tt1_hash_split",
    "tt11_deterministic_shuffle",
    "t6_pii_scrub",
    "t10_top_bigrams",
    "t11_chunk_windows",
    "tt6_greedy_pack",
    "tt7_weighted_sample",
    "pipe1_curation_pipeline",
    "pipe4_full_curation",
    "t12_bm25_topdocs",
    "tt8_ngram_decontaminate",
    "pm4_last_touch_attribution",
    "st10_sliding_counts",
    "t14_vocab_build",
    # round-6 late additions (cheap single-plan queries only; the
    # iterative BPE trainer and the LSH-composing tt12 are excluded so
    # the headline stays a per-operator timing, not a pipeline rerun;
    # er1_blocked_matches is excluded because its FIXED block key makes
    # in-block pairs grow quadratically with sf — measured 42 s at sf1 —
    # which is the blocking lesson SCALE.md documents, not a headline op)
    "t17_bpe_pair_counts",
    "s16_random_projection",
    "ml1_loo_target_encoding",
    "d11_cross_source_dups",
    "t21_freq_of_freq",
    "t22_vocab_growth",
    "x9_interval_coalesce",
    "pm7_top_session_paths",
    "dq12_skew_profile",
    "dq13_join_cardinality",
    "tt13_temperature_mixture",
    "x10_time_weighted_avg",
    "a24_mad_outliers",
    "dq15_fd_audit",
    "dq16_chisq_independence",
    "s17_pairwise_cosine_profile",
    "t23_readability",
    # round-7 additions: the train-ready capstone pipeline (quality →
    # dedup → split → decontaminate with quarantined eval set) now
    # carries a longitudinal perf number next to pipe1/pipe4, and the
    # scale-safe ER variant replaces the excluded quadratic er1.
    "pipe6_train_ready",
    "er2_scale_safe_matches",
    # round-8 addition: er3 entered the headline after its ~10 s flat
    # overhead was traced to py4j DataFrame-BUILD chatter (hundreds of
    # literal structs built one Column call at a time) and fixed with
    # generated-SQL twins of the lane arrays — cold at sf0.1 dropped
    # 13.2 s -> 6.4 s, now data-dominated (SCALE.md "er3 build cost").
    "er3_indel_complete_matches",
    # round-9 addition: the passage REMOVAL operator (d14) joins its
    # audit twin (d9) in the headline — 1.22 s vs d9's 1.04 s at
    # sf0.1 on entry, the rebuild costing ~17% over the stats pass.
    "d14_passage_scrubbed_corpus",
    # round-10 additions: the CCNet-style LM-perplexity gate (two
    # grouped counts + one bigram-keyed scoring join) and the
    # shared-scan multi-FD audit (kept on its shared-scan form with
    # the honest local-scale negative recorded — SCALE.md "dq19").
    "t25_lm_perplexity",
    "dq19_fd_multi_audit",
    # round-11 addition: Moore-Lewis selection — the heaviest new
    # lane (two bigram LMs + a double-scored stream + exact NTILE);
    # gr8/dq20 stay out (gr8's cost story is the sf100 record, dq20
    # is a single narrow groupBy).
    "tt16_moore_lewis",
    # er4_match_stats (the count-only governance form) stays out: the
    # headline already times the same lane machinery twice via
    # er2 + er3; er4's scale story is the sf100 spot record
    # (BENCH_sf100_r09.json + SCALE.md "sf100 expensive tail").
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from aws_csp_datapipeline_spark.session import get_spark
    from aws_csp_datapipeline_spark.plans import registry

    spark = get_spark(app_name="bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    # include any extra headline queries registered later
    extra = os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "")
    names += [n for n in extra.split(",") if n and n in qs and n not in names]

    from pyspark.sql import functions as F

    def force(df):
        """Force FULL evaluation of every output column. A bare
        ``.count()`` lets Catalyst prune count-invariant work — final
        projections (t1/t2/tt1's per-row expressions), Window nodes
        whose output no one reads (tt11's pos), and multiplicity-
        preserving left joins (d10's pair join) — so count-timings
        measured only the scan for those shapes. Hashing every column
        into one bit_xor aggregate defeats pruning while adding one
        cheap hash per output row."""
        df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()

    def timed_run(name):
        """One COLD-cache execution. Spark's CacheManager dedups
        identical plans session-wide, so without clearing, a query
        that persists an intermediate would serve reps 2-3 (and any
        same-plan sibling, e.g. s10's BM25 sharing t12's) from the
        rep-1 cache — min-of-reps would then time cache-hit reads,
        not query execution. Clearing per run keeps every sample a
        full from-parquet execution; JVM/JIT/page-cache warmth still
        motivates min-of-reps."""
        spark.catalog.clearCache()
        force(qs[name](spark, sf_dir))

    # Warm-up: touch the session and parquet footers once, not timed.
    force(qs[names[0]](spark, sf_dir))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    rep_totals: list[float] = []
    for _ in range(reps):
        rep_total = 0.0
        for name in names:
            t0 = time.perf_counter()
            timed_run(name)
            dt = time.perf_counter() - t0
            rep_total += dt
            samples[name].append(dt)
        rep_totals.append(round(rep_total, 4))

    timings = {n: round(min(s), 4) for n, s in samples.items()}
    medians = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    total = round(sum(timings.values()), 4)
    # The JSON line is the bench contract; guarantee it is the LAST
    # thing on stdout and flushed (r13, VERDICT r12 item 8: the r11
    # record was captured truncated/unparsed, erasing a whole
    # round-over-round comparison — Spark logs go to stderr, and an
    # explicit flush means a capture that kills the process right
    # after reading the line still has the complete record).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "median_total": round(sum(medians.values()), 4),
                "sf": sf,
                "reps": reps,
                "rep_totals": rep_totals,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
