#!/usr/bin/env python3
"""Bench-delta gate: diff two full per-query bench JSONs (the files
graft.Bench writes as BENCH_full_r{N}.json / BENCH_full_latest.json).

Usage:  python3 tools/bench_delta.py OLD.json NEW.json [--threshold 1.5]

Exit 1 when any common query regressed more than the threshold AND by more
than 0.5 s absolute (sub-second noise is not a regression signal on a
shared machine — see NOTES.md "Round gate"). Every flagged query must get
a written cause in NOTES.md before the end-of-round commit.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ns = ap.parse_args()
    thr = ns.threshold
    old, new = load(ns.old), load(ns.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries"); sys.exit(2)
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"{len(common)} common queries: {so:.1f}s -> {sn:.1f}s (ratio {sn/so:.2f})")
    added = sorted(set(new) - set(old))
    if added:
        print(f"new queries (+{sum(new[k] for k in added):.1f}s): {', '.join(added)}")
    flagged = []
    for k in common:
        r = new[k] / old[k] if old[k] > 0 else float("inf")
        if r > thr and new[k] - old[k] > 0.5:
            flagged.append((r, k))
    for r, k in sorted(flagged, reverse=True):
        print(f"  REGRESSED {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({r:.1f}x)")
    if flagged:
        print(f"{len(flagged)} regressions > {thr}x — explain in NOTES.md before committing")
        sys.exit(1)
    print("bench delta clean")


if __name__ == "__main__":
    main()
