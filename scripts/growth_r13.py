#!/usr/bin/env python3
"""Per-query growth table between two bench JSONs (e.g. sf10 -> sf100).

Usage: python3 scripts/growth_r13.py <benchA.json> <benchB.json> [factor]

factor = data-size ratio between the two runs (default 10). Growth is
B/A; a query is flagged superlinear when B/A > factor * 1.3 (30% slack
for fixed overheads shifting between scales).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

def flat(d):
    out = {}
    for sec in ("queries", "extras"):
        out.update({k: v for k, v in d.get(sec, {}).items()})
    for k, v in d.get("maint", {}).items():
        if isinstance(v, dict) and "op_s" in v:
            out[k + ".op"] = v["op_s"]
    for k, v in d.get("ann", {}).items():
        if k.endswith("_s"):
            out["ann." + k] = v
    for k, v in d.get("txn", {}).items():
        if isinstance(v, (int, float)):
            out["txn." + k] = v
    return out

fa, fb = flat(a), flat(b)
rows = []
for k in sorted(fb):
    if k in fa and isinstance(fa[k], (int, float)) and fa[k] > 0 \
            and isinstance(fb[k], (int, float)) and fb[k] > 0:
        rows.append((k, fa[k], fb[k], fb[k] / fa[k]))

sup = [r for r in rows if r[3] > factor * 1.3]
print(f"{'query':<34}{'A_s':>9}{'B_s':>9}{'growth':>8}")
for k, va, vb, g in sorted(rows, key=lambda r: -r[3]):
    mark = "  <-- SUPERLINEAR" if g > factor * 1.3 else ""
    print(f"{k:<34}{va:>9.2f}{vb:>9.2f}{g:>7.1f}x{mark}")
ta = sum(r[1] for r in rows)
tb = sum(r[2] for r in rows)
print(f"\ntotal over common queries: {ta:.1f} -> {tb:.1f} "
      f"({tb/ta:.1f}x at {factor:.0f}x data)")
print(f"superlinear (> {factor*1.3:.0f}x): {len(sup)}")
