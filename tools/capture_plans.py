"""Capture `.explain("formatted")` output for named registry queries
into plans/r12/<query>_<suffix>.txt — the committed evidence for the
optimization round's plan-shape claims.

Usage:
    python tools/capture_plans.py --sf-dir /root/testdata/sf0.1 \
        --names er3_indel_complete_matches,er2_scale_safe_matches \
        --suffix before [--out plans/r12]
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--names", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out", default=os.path.join(repo_root, "plans", "r12"))
    args = ap.parse_args()

    from aws_csp_datapipeline_spark.plans import registry
    from aws_csp_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in args.names.split(",") if n]
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(p, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {args.sf_dir}\n\n")
            fh.write(plan)
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
