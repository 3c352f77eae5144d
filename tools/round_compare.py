#!/usr/bin/env python3
"""Round-over-round bench comparison, auto-normalized by the
code-frozen calibration probe (graft.Bench runs the same pinned
shuffle-agg first and last in every batch and reports it as
"calibration": {"pre": s, "post": s}).

For each shared query: raw ratio = new/old, normalized ratio =
raw / (cal_new / cal_old). The calibration factor is the geometric
mean of pre and post (the probe brackets the batch, so their mean
tracks the batch-average box speed). When either side lacks a
calibration block (pre-round-11 JSONs), only raw ratios print.

Each side may be a comma-separated list of bench JSONs (e.g. the
3-run cold batches); per-query and calibration values are medians
across the runs.

Usage: python3 tools/round_compare.py OLD.json[,OLD2...] NEW.json[,NEW2...]
"""
import sys, json, statistics


def load(paths):
    runs = [json.load(open(p)) for p in paths.split(",")]
    queries = {k: statistics.median(r["queries"][k] for r in runs)
               for k in runs[0]["queries"]}
    cals = [r.get("calibration") for r in runs]
    cal = None
    if all(c and c.get("pre") and c.get("post") for c in cals):
        cal = statistics.median(
            (c["pre"] * c["post"]) ** 0.5 for c in cals)
    return queries, cal


old, cal_old = load(sys.argv[1])
new, cal_new = load(sys.argv[2])
shared = sorted(set(old) & set(new))
if not shared:
    sys.exit("no shared queries between the two sides")

factor = None
if cal_old and cal_new:
    factor = cal_new / cal_old
    print(f"calibration: old {cal_old:.3f}s new {cal_new:.3f}s "
          f"-> box factor {factor:.3f} (normalizing)")
else:
    print("calibration: absent on one side -> raw ratios only")

rows = []
for q in shared:
    raw = new[q] / old[q] if old[q] else float("nan")
    norm = raw / factor if factor else None
    rows.append((q, old[q], new[q], raw, norm))
rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))

w = max(len(q) for q, *_ in rows)
hdr = f"{'query':<{w}}  {'old':>8}  {'new':>8}  {'raw':>6}"
if factor:
    hdr += f"  {'norm':>6}"
print(hdr)
for q, o, n, raw, norm in rows:
    line = f"{q:<{w}}  {o:8.2f}  {n:8.2f}  {raw:6.2f}"
    if factor:
        line += f"  {norm:6.2f}"
    print(line)

raws = [r[3] for r in rows]
print(f"\nmedian raw ratio: {statistics.median(raws):.3f}")
if factor:
    norms = [r[4] for r in rows]
    print(f"median normalized ratio: {statistics.median(norms):.3f}")
    worst = [(q, norm) for q, _, _, _, norm in rows if norm > 1.3]
    if worst:
        print("normalized >1.3x: " +
              ", ".join(f"{q} ({n:.2f}x)" for q, n in worst))
    else:
        print("no entry regresses >1.3x after normalization")
