"""Anchored bench protocol: separate HOST drift from CODE drift.

Round 11's verdict spent a session attributing a 1.17× raw sf0.1
regression to the host (the frozen-code anchor ran 1.9–2.4× its
record window while untouched lanes slowed identically). This tool
makes that attribution a committed artifact instead of archaeology:

1. run `bench.py` from a FROZEN worktree of the previous round's
   final commit (identical code to the committed BENCH_r{N-1} record),
2. run `bench.py` from the CURRENT tree, back-to-back on the same
   idle host,
3. emit ONE machine-readable JSON record holding both per-query
   median maps, the host anchor factor (frozen-now / frozen-record),
   and the code-level per-query ratios (current / frozen-now —
   host-free by construction).

Usage:
  python tools/bench_anchor.py --frozen .scratch/frozen_r11 \
      --record BENCH_r11.json --out BENCH_sf0.1_r12.json
  python tools/bench_anchor.py --skip-run \
      --frozen-json .scratch/bench_frozen.out \
      --current-json .scratch/bench_current.out \
      --record BENCH_r11.json --out BENCH_sf0.1_r12.json

Never run while pytest or another Spark job is active (SCALE.md
"Bench variance": co-load swings totals ±35%).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys


def parse_bench_output(text: str) -> dict:
    """Last JSON object in a bench.py stdout capture (the one line the
    contract promises, but tolerant of log noise around it)."""
    candidates = re.findall(r"\{.*\}", text)
    for c in reversed(candidates):
        try:
            d = json.loads(c)
            if "queries" in d:
                return d
        except json.JSONDecodeError:
            continue
    raise ValueError("no bench JSON line found")


def load_record(path: str) -> dict | None:
    """A prior committed record: repo format (bench.py JSON) or the
    driver's BENCH_r{N}.json capture (JSON possibly only in 'tail')."""
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    # the tail may hold a truncated JSON suffix; recover the per-query
    # map by regexing "name": float pairs (medians aren't recoverable,
    # so fall back to the min map the driver format prints first)
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    )
    meta = {"n", "rc", "cpus", "sf", "reps", "value", "median_total"}
    pairs = {k: v for k, v in pairs.items() if k not in meta}
    return {"queries": pairs} if pairs else None


def run_bench(cwd: str, env_extra: dict | None = None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = cwd
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return parse_bench_output(out.stdout)


def summarize(frozen: dict, current: dict, record: dict | None) -> dict:
    fq = frozen.get("queries_median") or frozen["queries"]
    cq = current.get("queries_median") or current["queries"]
    shared = sorted(set(fq) & set(cq))
    ratios = {n: round(cq[n] / fq[n], 4) for n in shared if fq[n] > 0}
    rs = sorted(ratios.values())
    summary = {
        "shared_queries": len(shared),
        "code_ratio_sum": round(
            sum(cq[n] for n in shared) / sum(fq[n] for n in shared), 4
        ),
        "code_ratio_median": round(statistics.median(rs), 4) if rs else None,
        "code_ratio_worst5": sorted(
            ratios.items(), key=lambda kv: -kv[1]
        )[:5],
    }
    if record:
        rq = record.get("queries_median") or record["queries"]
        rshared = sorted(set(fq) & set(rq))
        if rshared:
            summary["host_anchor_factor"] = round(
                sum(fq[n] for n in rshared) / sum(rq[n] for n in rshared), 4
            )
            summary["host_anchor_note"] = (
                "frozen-code now / same-code committed record; divide raw "
                "cross-round ratios by this before reading them as code"
            )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frozen", help="frozen worktree dir (runs bench.py there)")
    ap.add_argument("--record", help="prior committed bench record JSON")
    ap.add_argument("--out", required=True)
    ap.add_argument("--skip-run", action="store_true")
    ap.add_argument("--frozen-json", help="pre-captured frozen bench stdout")
    ap.add_argument("--current-json", help="pre-captured current bench stdout")
    args = ap.parse_args()

    if args.skip_run:
        frozen = parse_bench_output(open(args.frozen_json).read())
        current = parse_bench_output(open(args.current_json).read())
    else:
        frozen = run_bench(args.frozen)
        current = run_bench(os.path.dirname(os.path.abspath(__file__)) + "/..")
    record = load_record(args.record) if args.record else None

    out = {
        "protocol": "anchored-bench v1 (tools/bench_anchor.py)",
        "summary": summarize(frozen, current, record),
        "current": current,
        "frozen": frozen,
        "record_source": args.record,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["summary"], indent=1))


if __name__ == "__main__":
    main()
