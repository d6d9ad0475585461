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
    # Bench records a failed query as -1.0: treat any non-positive value
    # as missing so one failure prints '—' instead of crashing log10.
    def val(x):
        return x if x is not None and x > 0 else None

    rows = []
    for q, raw10 in q10.items():
        v1, v01, v10 = val(q1.get(q)), val(q01.get(q)), val(raw10)
        e1 = math.log10(v1 / v01) if v1 and v01 else None
        e10 = math.log10(v10 / v1) if v10 and v1 else None
        rows.append((q, v01, v1, v10, e1, e10))
    rows.sort(key=lambda r: -(r[5] if r[5] is not None else -9))
    print(f"| {'query':24s} | sf0.1 | sf1 | sf10 | exp 0.1→1 | exp 1→10 |")
    print("|---|---|---|---|---|---|")
    for q, v01, v1, v10, e1, e10 in rows:
        f = lambda x, s="%.2f": (s % x) if x is not None else "—"
        print(f"| {q:24s} | {f(v01)} | {f(v1)} | {f(v10)} | {f(e1)} | {f(e10)} |")
    # totals over the SHARED SUCCESSFUL set only: a query missing or
    # failed at either sf must not contribute its time to just one side
    shared = [(r[2], r[3]) for r in rows if r[2] is not None and r[3] is not None]
    tot1 = sum(a for a, _ in shared)
    tot10 = sum(b for _, b in shared)
    exps = [r[5] for r in rows if r[5] is not None]
    exps.sort()
    med = exps[len(exps) // 2] if exps else float("nan")
    hot = [(q, e) for q, _, _, _, _, e in rows if e is not None and e > 1.1]
    if tot1 > 0 and tot10 > 0:
        print(f"\ntotals (shared queries): sf1 {tot1:.1f} s -> sf10 {tot10:.1f} s"
              f" (exp {math.log10(tot10 / tot1):.2f}); median exponent {med:.2f};"
              f" >1.1: {', '.join(f'{q} {e:.2f}' for q, e in hot) or 'none'}")
    else:
        print("\ntotals: no query succeeded at both sf1 and sf10")
    # queries benched at sf1 but absent from the sf10 run (e.g. the
    # documented superlinear-d4 exclusion) must be visible, not vanish
    missing = sorted(q for q in q1 if q not in q10)
    if missing:
        print(f"excluded from sf10 run: {', '.join(missing)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
