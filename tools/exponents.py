#!/usr/bin/env python3
"""Per-query scale exponents between two graft.Bench full records
(target/bench.json format): exponent = log(t_hi/t_lo) / log(sf_hi/sf_lo).
With a 10x data step, exponent 1.0 = linear, >1.3 flagged.

Times below FLOOR seconds are skipped (fixed per-query overhead — session,
planning, tiny-file I/O — dominates and the ratio measures nothing).

Usage: tools/exponents.py <lo.json> <hi.json> <sf_lo> <sf_hi> [floor=0.5]
"""
import json, math, sys

lo, hi = (json.load(open(p)) for p in sys.argv[1:3])
sf_lo, sf_hi = float(sys.argv[3]), float(sys.argv[4])
floor = float(sys.argv[5]) if len(sys.argv) > 5 else 0.5
decades = math.log10(sf_hi / sf_lo)

rows = []
for q, t_lo in lo["queries"].items():
    t_hi = hi["queries"].get(q)
    if t_hi is None or t_lo <= 0 or t_hi <= 0:
        continue
    if max(t_lo, t_hi) < floor:
        continue
    rows.append((math.log10(t_hi / t_lo) / decades, q, t_lo, t_hi))

rows.sort(reverse=True)
print(f"| query | t(sf{sf_lo}) | t(sf{sf_hi}) | exponent |")
print("|---|---|---|---|")
for e, q, a, b in rows:
    flag = " **<-- super-linear**" if e > 1.3 else ""
    print(f"| {q} | {a:.2f}s | {b:.2f}s | {e:.2f}{flag} |")
skipped = len(lo["queries"]) - len(rows)
print(f"\n{len(rows)} measured, {skipped} below the {floor}s floor at both sfs "
      f"(fixed overhead, ratio meaningless); flagged >1.3: "
      f"{sum(1 for e, *_ in rows if e > 1.3)}")
