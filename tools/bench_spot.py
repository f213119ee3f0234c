"""Spot-bench a named subset of registry queries at an arbitrary
scale directory under the SAME strict protocol as bench.py (forced
bit_xor(xxhash64) evaluation of every output column + clearCache
before every sample, per-query MIN of N reps), printing one JSON
line. Used for the per-round scaled-decade records
(BENCH_sf{1,10,100}_r{N}.json).

Usage:
    python tools/bench_spot.py --sf-dir .scratch/sf100 \
        --names d3_minhash_lsh_pairs,pipe6_train_ready --reps 2 \
        --metric sf100_spot
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--names", required=True, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--metric", default="spot")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from aws_csp_datapipeline_spark.plans import registry
    from aws_csp_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench_spot")
    qs = registry.queries()
    names = [n for n in args.names.split(",") if n]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def force(df):
        df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()

    # warm-up: session + parquet footers, untimed
    force(qs[names[0]](spark, args.sf_dir))

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(1, args.reps)):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(qs[name](spark, args.sf_dir))
            samples[name].append(time.perf_counter() - t0)
            print(f"# {name}: {samples[name][-1]:.2f}s", file=sys.stderr)

    timings = {n: round(min(s), 4) for n, s in samples.items()}
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": args.metric,
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": timings,
                "queries_median": {
                    n: round(statistics.median(s), 4) for n, s in samples.items()
                },
                "value": round(sum(timings.values()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
