#!/usr/bin/env python3
"""Decade-ratio report over graft.Bench JSON outputs.

Usage: python3 tools/scale_report.py sf01.json sf1.json [sf10.json]

Prints per-query times and decade ratios (sf1/sf0.1, sf10/sf1), sorted
by the worst later-decade ratio, plus totals. Linear-in-rows work on a
fixed 32-core box shows <=10x per decade (usually much less, since
per-row overheads amortize); anything above 10x is flagged for the
SCALE.md explanation table.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"], d


def main(argv):
    runs = [load(p) for p in argv[1:]]
    # union across runs: a query present only in a later decade must
    # show up (as "-" in the runs that miss it), not silently vanish
    qs = sorted(set().union(*[r[0].keys() for r in runs]))
    for lbl, (q, _) in zip(argv[1:], runs):
        missing = [x for x in qs if x not in q]
        if missing:
            print(f"WARNING: {lbl} missing {len(missing)} queries: "
                  f"{', '.join(missing[:5])}{'...' if len(missing) > 5 else ''}")
    base_labels = ["sf0.1", "sf1", "sf10"]
    labels = [base_labels[i] if i < len(base_labels) else f"run{i}"
              for i in range(len(runs))]
    rows = []
    for q in qs:
        ts = [r[0].get(q) for r in runs]
        ratios = []
        for a, b in zip(ts, ts[1:]):
            ratios.append(b / a if a and b and a > 0 and b > 0 else None)
        rows.append((q, ts, ratios))

    def worst(r):
        vals = [x for x in r[2] if x is not None]
        return max(vals) if vals else 0.0

    rows.sort(key=worst, reverse=True)
    hdr = ["query"] + labels + [f"{b}/{a}" for a, b in zip(labels, labels[1:])]
    print("\t".join(hdr))
    for q, ts, ratios in rows:
        cells = [q]
        cells += [f"{t:.2f}" if t is not None and t >= 0 else "-" for t in ts]
        cells += [f"{r:.1f}x" if r is not None else "-" for r in ratios]
        flag = " <== >10x/decade" if worst((q, ts, ratios)) > 10 else ""
        print("\t".join(cells) + flag)
    for lbl, (_, meta) in zip(labels, runs):
        print(f"total {lbl}: {meta['value']:.1f}s / {meta['n_queries']} "
              f"queries, {meta['n_failed']} failed")


if __name__ == "__main__":
    main(sys.argv)
