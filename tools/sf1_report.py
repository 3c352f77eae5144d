#!/usr/bin/env python3
"""Summarize the sf1 (10x) scale run: per-query median cold seconds at
sf0.1 vs sf1, the ratio, and a linearity note. Inputs are Bench JSON
lines produced with SPARK_GRAFT_BENCH_OUT.

Usage: python3 tools/sf1_report.py sf01_cold1.json,sf01_cold2.json,... sf1_cold1.json,...
"""
import sys, json, statistics

def medians(paths):
    runs = [json.load(open(p))["queries"] for p in paths.split(",")]
    return {k: statistics.median(r[k] for r in runs) for k in runs[0]}

base = medians(sys.argv[1])
sf1 = medians(sys.argv[2])
rows = []
for q in sorted(sf1, key=lambda q: -sf1[q]):
    b, s = base.get(q), sf1[q]
    rows.append((q, b, s, (s / b) if b else None))
w = max(len(q) for q, *_ in rows)
print(f"{'query':<{w}}  {'sf0.1':>7}  {'sf1':>8}  {'ratio':>6}")
for q, b, s, r in rows:
    print(f"{q:<{w}}  {b:7.2f}  {s:8.2f}  {r:6.2f}")
tot_b = sum(b for _, b, _, _ in rows)
tot_s = sum(s for _, _, s, _ in rows)
print(f"{'TOTAL':<{w}}  {tot_b:7.2f}  {tot_s:8.2f}  {tot_s/tot_b:6.2f}")
