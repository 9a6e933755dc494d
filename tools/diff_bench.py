#!/usr/bin/env python3
"""Per-query round-over-round bench regression report.

Compares two bench-detail artifacts (the per-round `bench_detail_rN.json`
copies, or any two files with a `queries` sec-map) and prints the queries
whose wall moved more than a threshold, worst first — the diff the
per-round `bench_detail.json` overwrite used to make impossible.

Usage:
  python3 tools/diff_bench.py bench_detail_r10.json bench_detail_r11.json
  python3 tools/diff_bench.py old.json new.json --threshold 0.25 --min-sec 0.2
"""
import argparse
import json


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"], d.get("value"), set(d.get("failed", []))
    # a run_scale BENCH artifact carries base/scale sections — diff the base
    if "base" in d and isinstance(d.get("base"), dict):
        return (d["base"]["queries"], d["base"].get("total_sec"),
                set(d["base"].get("failed", [])))
    raise SystemExit(
        f"{path}: no 'queries' sec-map found (driver BENCH_r*.json files "
        f"only embed a truncated tail — diff the committed per-round "
        f"bench_detail_rN.json copies instead)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.20,
                    help="relative change to report (default 20%%)")
    ap.add_argument("--min-sec", type=float, default=0.15,
                    help="ignore queries faster than this in BOTH rounds "
                         "(sub-150 ms walls are timer noise)")
    a = ap.parse_args()

    qo, to, fo = load(a.old)
    qn, tn, fn = load(a.new)
    # a FAILED query's recorded time is an error time, not a wall: a
    # regression-to-failure would otherwise print as the round's biggest
    # FASTER win. Headline them first and keep them out of the diff.
    if fo or fn:
        newly_failed = sorted(fn - fo)
        if newly_failed:
            print(f"REGRESSED TO FAILURE in {a.new}: "
                  f"{', '.join(newly_failed)}")
        fixed = sorted(fo - fn)
        if fixed:
            print(f"failed in {a.old}, now passing: {', '.join(fixed)}")
    both = sorted((set(qo) & set(qn)) - fo - fn)
    rows = []
    for q in both:
        o, n = qo[q], qn[q]
        if max(o, n) < a.min_sec or o <= 0:
            continue
        rel = (n - o) / o
        if abs(rel) >= a.threshold:
            rows.append((rel, q, o, n))
    rows.sort(reverse=True)

    if to and tn:
        print(f"total: {to:.1f}s -> {tn:.1f}s "
              f"({(tn - to) / to * 100:+.1f}%), "
              f"{len(both)} comparable queries")
    slower = [r for r in rows if r[0] > 0]
    faster = [r for r in rows if r[0] < 0]
    for title, rs in (("SLOWER", slower), ("FASTER", faster)):
        if not rs:
            continue
        print(f"\n{title} (|change| >= {a.threshold:.0%}, "
              f"wall >= {a.min_sec}s):")
        for rel, q, o, n in rs:
            print(f"  {q:40s} {o:7.2f}s -> {n:7.2f}s  {rel * 100:+6.1f}%")
    if not rows:
        print("no per-query movement beyond threshold")
    only_o = sorted(set(qo) - set(qn))
    only_n = sorted(set(qn) - set(qo))
    if only_o:
        print(f"\nremoved since {a.old}: {', '.join(only_o)}")
    if only_n:
        print(f"\nnew in {a.new}: {', '.join(only_n)}")


if __name__ == "__main__":
    main()
