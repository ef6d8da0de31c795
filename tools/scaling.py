#!/usr/bin/env python3
"""Dev tool: per-query scale-up table from two Bench JSON artifacts.

Usage: scaling.py <bench_small.json> <bench_big.json> [factor]

`factor` is the data-volume ratio between the two runs (default 10).
Prints a markdown table sorted by time ratio (worst first) with a
simple classification against the factor:
  - sublinear:   ratio <= factor^0.5  (fixed overhead dominates)
  - ~linear:     ratio <= 1.3*factor
  - superlinear: ratio  > 1.3*factor  (investigate)
Queries below a floor (big run < 1s) are classed 'floor' — at that
size the number is scheduling overhead, not data cost.
"""
import json, sys

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        if name not in qb: continue
        a, b = qs[name], qb[name]
        if a <= 0 or b <= 0: rows.append((name, a, b, None, "FAILED")); continue
        r = b / a
        if b < 1.0: cls = "floor"
        elif r <= factor ** 0.5: cls = "sublinear"
        elif r <= 1.3 * factor: cls = "~linear"
        else: cls = "superlinear"
        rows.append((name, a, b, r, cls))
    rows.sort(key=lambda t: -(t[3] or 1e9))
    print(f"| query | t_small (s) | t_big (s) | ratio (x{factor:g} data) | class |")
    print("|---|---|---|---|---|")
    for name, a, b, r, cls in rows:
        rs = f"{r:.1f}" if r else "—"
        print(f"| {name} | {a:.2f} | {b:.2f} | {rs} | {cls} |")
    n = {}
    for _, _, _, _, cls in rows: n[cls] = n.get(cls, 0) + 1
    print(f"\nclasses: {n}; sum_small={sum(v for v in qs.values() if v>0):.1f}s "
          f"sum_big={sum(v for v in qb.values() if v>0):.1f}s")

main()
