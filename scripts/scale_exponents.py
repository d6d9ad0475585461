#!/usr/bin/env python3
"""Per-query scaling-exponent table across bench runs at increasing scale
factors (no DuckDB side — at sf10 the oracle is infeasible; correctness
there is ScaleCheck's invariant replay instead).

Usage: python3 scripts/scale_exponents.py <sf01.json> <sf1.json> <sf10.json>

Prints a markdown table sorted by the sf1→sf10 exponent
(log10(t_sf10/t_sf1); 1.0 = linear in rows) with the sf0.1→sf1 exponent
alongside, so curvature (a plan whose exponent GROWS with sf) is visible.
"""
import json
import math
import sys


def main(p01, p1, p10):
    q01 = json.load(open(p01))["queries"]
    q1 = json.load(open(p1))["queries"]
    q10 = json.load(open(p10))["queries"]
    rows = []
    for q, v10 in q10.items():
        v1, v01 = q1.get(q), q01.get(q)
        e1 = math.log10(v1 / v01) if v1 and v01 and v01 > 0 else None
        e10 = math.log10(v10 / v1) if v1 and v1 > 0 else None
        rows.append((q, v01, v1, v10, e1, e10))
    rows.sort(key=lambda r: -(r[5] if r[5] is not None else -9))
    print(f"| {'query':24s} | sf0.1 | sf1 | sf10 | exp 0.1→1 | exp 1→10 |")
    print("|---|---|---|---|---|---|")
    for q, v01, v1, v10, e1, e10 in rows:
        f = lambda x, s="%.2f": (s % x) if x is not None else "—"
        print(f"| {q:24s} | {f(v01)} | {f(v1)} | {f(v10)} | {f(e1)} | {f(e10)} |")
    tot10 = sum(v for v in q10.values() if v >= 0)
    tot1 = sum(v for q, v in q1.items() if q in q10 and v >= 0)
    exps = [r[5] for r in rows if r[5] is not None]
    exps.sort()
    med = exps[len(exps) // 2] if exps else float("nan")
    hot = [(q, e) for q, _, _, _, _, e in rows if e is not None and e > 1.1]
    print(f"\ntotals (shared queries): sf1 {tot1:.1f} s -> sf10 {tot10:.1f} s"
          f" (exp {math.log10(tot10 / tot1):.2f}); median exponent {med:.2f};"
          f" >1.1: {', '.join(f'{q} {e:.2f}' for q, e in hot) or 'none'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
