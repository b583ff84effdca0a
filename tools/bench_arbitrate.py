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
  - optionally (--diff-prior + --diff-out, VERDICT r12 item 4) a
    round-over-round BENCH_DIFF artifact: this arbitration's per-query
    min vs a prior round's BENCH_ARBITRATION.json, flagging >1.5x
    regressions — the "no query regressed" claim as a machine check.

Usage: python3 tools/bench_arbitrate.py [--runs BENCH_RUNS.jsonl]
           [--surface HASH] [--out BENCH_ARBITRATION.json] [--top N]
           [--diff-prior BENCH_ARBITRATION_rPREV.json]
           [--diff-out BENCH_DIFF_rN.json] [--regress-factor 1.5]
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
    ap.add_argument("--diff-prior", default=None,
                    help="prior round's BENCH_ARBITRATION.json to diff against")
    ap.add_argument("--diff-out", default=None,
                    help="where to write the round-over-round diff artifact")
    ap.add_argument("--regress-factor", type=float, default=1.5,
                    help="flag queries whose min grew by more than this factor")
    ap.add_argument("--min-delta", type=float, default=0.25,
                    help="absolute floor (s) for a ratio flag to count as a "
                         "regression: sub-quarter-second queries swing >1.5x "
                         "on fixture-write/scan-listing jitter alone; "
                         "ratio-only hits are still listed (ratio_flags)")
    ap.add_argument("--hard-factor", type=float, default=4.0,
                    help="ratio above which a regression counts REGARDLESS "
                         "of --min-delta: the jitter floor must not let a "
                         "genuine 10x blow-up on a fast query pass silently")
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
    if surface is None:
        # Legacy records (pre-surface_hash Bench) carry no surface; don't
        # silently group them under None and crash on surface[:12] below
        # (ADVICE r12) — the fix is a Bench rerun, say so.
        sys.exit("most recent run has no surface_hash (legacy record); "
                 "re-run graft.Bench or pass --surface explicitly")
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

    # Round-over-round regression diff (VERDICT r12 item 4): per-query min
    # vs the prior arbitration's min. min-of-N is the agreed arbitration
    # under hypervisor steal (BASELINE.md), so the diff compares the two
    # rounds' arbitrated numbers, not raw single runs.
    if args.diff_prior:
        if not args.diff_out:
            sys.exit("--diff-prior requires --diff-out")
        with open(args.diff_prior) as f:
            prior = json.load(f)
        prior_q = prior.get("per_query_sec", {})
        common = [n for n in names if n in prior_q]
        added = [n for n in names if n not in prior_q]
        removed = [n for n in prior_q if n not in per_query]
        rows = {}
        regressions = []
        ratio_flags = []
        for n in common:
            cur, prev = per_query[n]["min"], prior_q[n]["min"]
            ratio = cur / prev if prev > 0 else None
            rows[n] = {"prior_min": prev, "min": cur, "ratio": ratio}
            if ratio is not None:
                # the hard ceiling applies REGARDLESS of the soft factor
                # or the jitter floor (review-caught: nesting it under
                # regress_factor let --regress-factor 5 disable it)
                if ratio > args.hard_factor or (
                        ratio > args.regress_factor
                        and cur - prev > args.min_delta):
                    regressions.append(n)
                elif ratio > args.regress_factor:
                    ratio_flags.append(n)
        diff = {
            "surface_hash": surface,
            "prior_surface_hash": prior.get("surface_hash"),
            "regress_factor": args.regress_factor,
            "min_delta_sec": args.min_delta,
            "hard_factor": args.hard_factor,
            "n_common": len(common),
            "n_added": len(added),
            "n_removed": len(removed),
            "added": sorted(added),
            "removed": sorted(removed),
            "regressions": sorted(regressions),
            "ratio_flags_under_delta": sorted(ratio_flags),
            "total_min_sec": summary["total_min_of_runs_sec"],
            "prior_total_min_sec": prior.get("total_min_of_runs_sec"),
            "per_query": rows,
        }
        with open(args.diff_out, "w") as f:
            json.dump(diff, f, indent=1, sort_keys=True)
        print()
        print(f"Diff vs {args.diff_prior}: {len(common)} common, "
              f"{len(added)} added, {len(removed)} removed; "
              f"{len(regressions)} regression(s) > {args.regress_factor}x "
              f"and > {args.min_delta}s"
              + (": " + ", ".join(sorted(regressions)) if regressions else "")
              + (f"; ratio-only flags under the delta floor: "
                 + ", ".join(sorted(ratio_flags)) if ratio_flags else ""))


if __name__ == "__main__":
    main()
