#!/usr/bin/env python3
"""Merge the Spark and DuckDB sides of a scale-factor bench run into one
snapshot JSON and print the per-query scaling table for BENCH_NOTES.

Usage: python3 scripts/scale_report.py <spark_sfN.json> <duckdb_sfN.json> \
           <spark_base.json> <out.json>

spark_base is the sf0.1 catalog bench (BENCH_local_r5.json shape); the
scaling exponent printed is log10(t_sfN / t_base) for a 10x data step —
1.0 = linear, <1 sublinear, >1 superlinear.
"""
import json
import math
import sys


def main(spark_path, duck_path, base_path, out_path):
    spark = json.load(open(spark_path))
    duck = json.load(open(duck_path))
    base = json.load(open(base_path))["queries"]
    sq, dq = spark["queries"], duck["queries"]

    merged = {
        "metric": "sf1_catalog",
        "unit": "sec",
        "spark_total": round(sum(sq.values()), 3),
        "duckdb_total": round(sum(dq[q] for q in sq if q in dq), 3),
        "n_queries": len(sq),
        "spark_queries": {q: round(v, 4) for q, v in sorted(sq.items())},
        "duckdb_queries": {q: round(v, 4) for q, v in sorted(dq.items())},
        "sf_dir": duck.get("sf"),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)

    rows = []
    for q, v in sq.items():
        b = base.get(q)
        exp = math.log10(v / b) if b else None
        rows.append((q, b, v, dq.get(q), exp))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else -9))
    print(f"| {'query':24s} | sf0.1 | sf1 | exp | duckdb sf1 | vs duck |")
    print("|---|---|---|---|---|---|")
    for q, b, v, d, e in rows:
        bs = f"{b:.2f}" if b else "—"
        es = f"{e:.2f}" if e is not None else "—"
        ds = f"{d:.2f}" if d else "—"
        rs = f"{v / d:.2f}×" if d else "—"
        print(f"| {q:24s} | {bs} | {v:.2f} | {es} | {ds} | {rs} |")
    st, dt = merged["spark_total"], merged["duckdb_total"]
    print(f"\ntotal: spark {st:.1f} s vs duckdb {dt:.1f} s -> {st/dt:.2f}x")


if __name__ == "__main__":
    main(*sys.argv[1:])
