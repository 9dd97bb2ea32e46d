#!/usr/bin/env python3
"""Per-query runtime ratios between two bench records (scale-probe
adjudication: pass the smaller-scale record first). Every super-linear
outlier the table surfaces must be NAMED and adjudicated in the round
record — the tool ranks, a person (or the round write-up) explains."""
import json, sys

small = json.load(open(sys.argv[1]))["queries"]  # smaller-scale record
large = json.load(open(sys.argv[2]))["queries"]  # larger-scale record

rows = []
for q, t1 in large.items():
    t0 = small.get(q)
    if t0 is None:
        rows.append((q, None, t1, None))
        continue
    rows.append((q, t0, t1, t1 / t0 if t0 > 0 else None))

rows.sort(key=lambda r: -(r[3] or 0))
tot0 = sum(r[1] for r in rows if r[1] is not None)
tot1 = sum(r[2] for r in rows if r[1] is not None)
print(f"total shared: A {tot0:.1f}s -> B {tot1:.1f}s  ratio {tot1/tot0:.2f}x")
over3 = [r for r in rows if r[3] and r[3] > 3.0]
print(f"queries with ratio > 3x: {len(over3)}")
print(f"{'query':34s} {'A':>7s} {'B':>8s} {'ratio':>6s}")
for q, t0, t1, r in rows[:40]:
    print(f"{q:34s} {t0 if t0 else -1:7.2f} {t1:8.2f} {r if r else -1:6.2f}")
