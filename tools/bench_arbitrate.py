#!/usr/bin/env python3
"""Render the cross-run bench arbitration from BENCH_RUNS.jsonl.

Every full graft.Bench run appends its complete per-query record
(including every rep's time) to BENCH_RUNS.jsonl. This tool groups the
runs by `surface_hash` (runs are comparable only when they timed the
same query set), picks the most recent surface by default, and emits:

  - BENCH_ARBITRATION.json — per query: min / median across ALL reps of
    ALL runs of that surface, plus per-run medians; and the aggregate
    totals the perf gate arbitrates on (sum-of-medians per run,
    sum-of-min-across-runs).
  - stdout — the markdown arbitration table BASELINE.md embeds, so the
    prose table is GENERATED from the artifact instead of hand-written
    (VERDICT r11 item 3).

Usage: python3 tools/bench_arbitrate.py [--runs BENCH_RUNS.jsonl]
           [--surface HASH] [--out BENCH_ARBITRATION.json] [--top N]
"""
import argparse
import json
import statistics
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="BENCH_RUNS.jsonl")
    ap.add_argument("--surface", default=None,
                    help="surface_hash to arbitrate (default: the most recent run's)")
    ap.add_argument("--out", default="BENCH_ARBITRATION.json")
    ap.add_argument("--top", type=int, default=10,
                    help="rows in the stdout table (slowest by min)")
    args = ap.parse_args()

    runs = []
    with open(args.runs) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("metric") == "total" and "queries" in r:
                runs.append(r)
    if not runs:
        sys.exit(f"no full-run records in {args.runs}")

    surface = args.surface or runs[-1].get("surface_hash")
    sel = [r for r in runs if r.get("surface_hash") == surface]
    if not sel:
        sys.exit(f"no runs with surface_hash={surface}")

    names = sorted(sel[-1]["queries"].keys())
    per_query = {}
    for n in names:
        all_reps = []
        run_medians = []
        for r in sel:
            reps = r.get("queries_reps", {}).get(n)
            if reps:
                all_reps.extend(reps)
            med = r["queries"].get(n)
            if med is not None:
                run_medians.append(med)
        per_query[n] = {
            "min": min(all_reps) if all_reps else min(run_medians),
            "median": statistics.median(all_reps if all_reps else run_medians),
            "run_medians": run_medians,
            "n_reps": len(all_reps),
        }

    run_totals = [sum(r["queries"].get(n, 0.0) for n in names) for r in sel]
    summary = {
        "surface_hash": surface,
        "n_queries": len(names),
        "n_runs": len(sel),
        "sf": sel[-1].get("sf"),
        "run_totals_sec": run_totals,
        "total_min_of_runs_sec": sum(v["min"] for v in per_query.values()),
        "total_last_run_sec": run_totals[-1],
        "per_query_sec": per_query,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)

    # markdown table for BASELINE.md
    print(f"Arbitration over {len(sel)} run(s), surface {surface[:12]}…, "
          f"{len(names)} queries, sf={summary['sf']}")
    print(f"run totals (sum of per-query medians): "
          f"{' / '.join(f'{t:.1f}' for t in run_totals)} s")
    print(f"min-of-runs total: {summary['total_min_of_runs_sec']:.1f} s "
          f"({summary['total_min_of_runs_sec']/len(names):.3f} s/query)")
    print()
    print("| query | min (s) | median (s) | per-run medians (s) |")
    print("|---|---|---|---|")
    worst = sorted(names, key=lambda n: -per_query[n]["min"])[:args.top]
    for n in worst:
        v = per_query[n]
        rm = " / ".join(f"{x:.2f}" for x in v["run_medians"])
        print(f"| {n} | {v['min']:.2f} | {v['median']:.2f} | {rm} |")


if __name__ == "__main__":
    main()
