#!/usr/bin/env python3
"""Compare two Bench detail outputs (per-query seconds) across scale factors.

Usage: python3 scripts/scale_ratios.py /tmp/bench_sf01_full.txt /tmp/bench_sf1_full.txt [data_ratio]

Each input file holds the two JSON lines Bench prints (detail + metric).
Prints per-query ratios sorted descending, flagging queries whose wall-clock
grew faster than the data (ratio > data_ratio) — superlinear candidates.
"""
import sys, json

def load(path):
    detail, metric = None, None
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        o = json.loads(line)
        if o.get("detail") == "per_query_sec":
            detail = o["queries"]
        elif o.get("metric") == "total":
            metric = o
    return detail, metric

small, sm = load(sys.argv[1])
big, bm = load(sys.argv[2])
data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

print(f"total: {sm['value']}s -> {bm['value']}s  ratio {bm['value']/sm['value']:.2f}x (data {data_ratio:.0f}x)")
rows = []
for q, t0 in small.items():
    t1 = big.get(q)
    if t1 is None or t0 <= 0 or t1 <= 0:
        continue
    rows.append((t1 / t0, q, t0, t1))
rows.sort(reverse=True)
flagged = 0
for r, q, t0, t1 in rows:
    mark = " <-- SUPERLINEAR" if r > data_ratio else ""
    if mark:
        flagged += 1
    print(f"{r:6.2f}x  {q:40s} {t0:7.3f} -> {t1:7.3f}{mark}")
print(f"\n{flagged} queries above the {data_ratio:.0f}x data ratio")
