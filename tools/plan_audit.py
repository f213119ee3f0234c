"""Physical-plan audit over the bench headline: for every query,
count the scale-relevant plan features (exchanges, broadcast joins,
sort-merge joins, Python evals, scans with pushed filters / pruned
schemas) and flag the anti-patterns this repo's scale policy bans
(CartesianProduct, row-at-a-time BatchEvalPython in a non-UDF-demo
query). Writes a markdown table so plan regressions show up in
review diffs, not just in wall-clock noise.

Run: python tools/plan_audit.py [SF_DIR] [OUT_MD]
"""

from __future__ import annotations

import os
import re
import sys


def collect_features(df) -> dict:
    """Scale-relevant physical-plan features of a DataFrame — the
    shared collector behind the CLI table and the pytest plan-budget
    regression gate (tests/test_plan_budget.py)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "scans": plan.count("FileScan parquet"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]*\w", plan)),
        "exch": len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "pandas": plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "pyrow": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "cartesian": plan.count("CartesianProduct"),
        "rowudf": plan.count("BatchEvalPython"),
    }


def parse_audit_table(md_path: str) -> dict[str, dict]:
    """Parse the committed PLAN_AUDIT.md table back into per-query
    feature budgets ({name: {scans:…, exch:…, …}})."""
    budgets: dict[str, dict] = {}
    with open(md_path) as fh:
        for line in fh:
            m = re.match(
                r"\| (\w+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) "
                r"\| (\d+) \| (\d+) \|",
                line,
            )
            if m:
                name = m.group(1)
                vals = [int(x) for x in m.groups()[1:]]
                budgets[name] = dict(
                    zip(
                        ["scans", "pushed", "exch", "bhj", "smj", "pandas", "pyrow"],
                        vals,
                    )
                )
    return budgets


def main() -> None:
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo_root, "PLAN_AUDIT.md"
    )
    from aws_csp_datapipeline_spark.session import get_spark
    from aws_csp_datapipeline_spark.plans import registry
    import bench

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {s.name: s.fn for s in registry.specs()}

    rows = []
    flags = []
    for name in bench.HEADLINE:
        if name not in qs:
            continue
        f = collect_features(qs[name](spark, sf_dir))
        if f["cartesian"]:
            flags.append(f"{name}: CartesianProduct present")
        if f["rowudf"]:
            flags.append(f"{name}: row-at-a-time Python UDF in plan")
        rows.append(
            (name, f["scans"], f["pushed"], f["exch"], f["bhj"], f["smj"],
             f["pandas"], f["pyrow"])
        )

    with open(out_md, "w") as fh:
        fh.write(
            "# Physical-plan audit (bench headline)\n\n"
            f"Scale factor dir: `{sf_dir}`. Regenerate with "
            "`python tools/plan_audit.py`.\n\n"
            "Columns: parquet scans / scans with pushed filters / "
            "shuffle exchanges / broadcast-hash joins / sort-merge "
            "joins / Arrow pandas ops / Python row evals.\n\n"
            "| query | scans | pushed | exch | bhj | smj | pandas | pyrow |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write("| " + " | ".join(str(v) for v in r) + " |\n")
        fh.write("\n## Flags\n\n")
        if flags:
            for f in flags:
                fh.write(f"- {f}\n")
        else:
            fh.write(
                "None: no CartesianProduct, no row-at-a-time Python "
                "UDF in any headline plan.\n"
            )
    print(f"wrote {out_md}: {len(rows)} queries, {len(flags)} flags")


if __name__ == "__main__":
    main()
