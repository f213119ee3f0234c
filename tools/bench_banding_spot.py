"""A/B spot-bench of d3's banding lanes at an arbitrary scale dir:
default (k=32, b=16, r=2) vs half-cost (k=30, b=10, r=3), same strict
forced-eval cold-cache protocol as bench_spot.py, PLUS a pair-count
equality check (the half-cost lane is only admissible where it loses
zero verified pairs — `dedup.banding_recommendation` predicts this,
the run records it).

Usage:
    python tools/bench_banding_spot.py --sf-dir .scratch/sf100 --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--lanes",
        default="default,half-cost",
        help="comma-separated banding lanes to run (a corpus where the "
        "default lane's band-collision mass exceeds local disk — the "
        "sf100 boilerplate regime, SCALE.md — benches half-cost only)",
    )
    ap.add_argument(
        "--skip-equality",
        action="store_true",
        help="skip the pair-count equality check (needs every lane)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions import dedup as D
    from aws_csp_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_banding_spot")

    def pairs(banding):
        d = load_table(spark, args.sf_dir, "documents")
        return D.minhash_lsh_pairs(
            d, "text", "doc_id", threshold=0.8, k=32, bands=16, n=3,
            banding=banding,
        )

    def force(df):
        df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()

    lanes = [b for b in args.lanes.split(",") if b]
    force(pairs(lanes[0]))  # warm-up: session + parquet footers, untimed

    samples = {b: [] for b in lanes}
    for _ in range(max(1, args.reps)):
        for banding in lanes:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(pairs(banding))
            samples[banding].append(time.perf_counter() - t0)
            print(f"# {banding}: {samples[banding][-1]:.2f}s", file=sys.stderr)

    counts = {}
    if not args.skip_equality:
        for banding in lanes:
            spark.catalog.clearCache()
            counts[banding] = pairs(banding).count()
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "d3_banding_spot",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": {b: round(min(s), 4) for b, s in samples.items()},
                "pairs": counts,
                "pairs_equal": len(set(counts.values())) <= 1,
                "reps": args.reps,
            }
        )
    )


if __name__ == "__main__":
    main()
