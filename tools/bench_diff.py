#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [--threshold 1.3]

Accepts either the driver's BENCH_r{N}.json or the full-precision
BENCH_LOCAL.json (whose extra `telemetry` and `passTotals` fields are used
when present). Prints total delta, the per-query regressions/improvements
beyond the ratio threshold, and — when telemetry exists on the new side —
whether a regressed query's extra time is GC-dominated (environment/heap
pressure) or compute (engine regression).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed", d) if isinstance(d.get("parsed", None), dict) else d


def fmt_row(name, old, new, tel=None):
    ratio = new / old if old > 0 else float("inf")
    line = f"  {name:<28} {old:>8.2f}s -> {new:>8.2f}s  ({ratio:>5.2f}x)"
    if tel:
        line += (f"  taskGc={tel.get('taskGcSec', 0):.1f}s"
                 f" spill={tel.get('spillMb', 0)}MB"
                 f" storage@start={tel.get('storageAtStartMb', 0)}MB")
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="report queries whose ratio exceeds this (or 1/this)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    tel = (new.get("telemetry") or {}).get("pass1", {})

    # aborted/partial records may lack a total or carry 0.0 — keep the
    # per-query comparison usable instead of crashing on the header line
    ov, nv = old.get("value") or 0.0, new.get("value") or 0.0
    ratio = f"({nv / ov:.2f}x)" if ov > 0 else "(n/a)"
    print(f"total: {ov:.1f}s -> {nv:.1f}s {ratio}   "
          f"[{args.old} -> {args.new}]")
    for label, passes in (("old", old.get("passTotals")),
                          ("new", new.get("passTotals"))):
        if passes and len(passes) > 1:
            drift = max(passes) / min(passes) - 1
            print(f"{label} passTotals: "
                  + ", ".join(f"{p:.1f}s" for p in passes)
                  + f"  (max drift {drift:.0%})")

    common = sorted(set(qo) & set(qn))
    only_old, only_new = sorted(set(qo) - set(qn)), sorted(set(qn) - set(qo))
    if only_old:
        print(f"dropped queries: {', '.join(only_old)}")
    if only_new:
        print(f"new queries: {', '.join(only_new)} "
              f"(+{sum(qn[q] for q in only_new):.1f}s of the total delta)")

    regressed = [q for q in common if qo[q] > 0
                 and qn[q] / qo[q] > args.threshold and qn[q] - qo[q] > 0.5]
    improved = [q for q in common if qn[q] > 0
                and qo[q] / qn[q] > args.threshold and qo[q] - qn[q] > 0.5]
    regressed.sort(key=lambda q: qo[q] - qn[q])
    improved.sort(key=lambda q: qn[q] - qo[q])

    if regressed:
        print(f"\nregressed (> {args.threshold}x and > 0.5s):")
        for q in regressed:
            print(fmt_row(q, qo[q], qn[q], tel.get(q)))
        gc_heavy = [q for q in regressed
                    if tel.get(q, {}).get("taskGcSec", 0) > 0.5 * qn[q]]
        if gc_heavy:
            print("  ^ GC-dominated (taskGc > 50% of wall): "
                  + ", ".join(gc_heavy)
                  + " — heap pressure, not engine compute")
    else:
        print(f"\nno per-query regressions beyond {args.threshold}x")
    if improved:
        print("\nimproved:")
        for q in improved:
            print(fmt_row(q, qo[q], qn[q]))

    delta = sum(qn[q] - qo[q] for q in common)
    print(f"\ncommon-query delta: {delta:+.1f}s over {len(common)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
