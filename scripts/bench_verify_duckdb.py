#!/usr/bin/env python3
"""DuckDB oracle bench + correctness compare in one pass, built for large
scale factors where single oracle statements run minutes and intermediate
state can exceed RAM:

- PRAGMA memory_limit + temp_directory: quadratic oracles spill to disk
  instead of OOM-killing the process (the naive 3-pass bench died at
  120 GB RSS on sf1).
- Per-query partial results appended to <out>.partial.jsonl as they
  land — a crash loses one query, not the run.
- Cheapest-first order (by a prior sf0.1 timing when given) so the
  tractable 90% of the catalog is banked before the monsters run.
- Per-query wall timeout via con.interrupt() from a timer thread;
  interrupted queries record timed_out=True with the elapsed floor.
- warmup+1 timed execution per query (not 3 passes): at sf1 per-query
  times are 1-600 s and run-to-run variance is noise relative to the
  engine gap being measured. The timed execution streams the result in
  chunks (no giant fetchall list).
- If <spark_out_dir> is given, the warmup execution's result is compared
  against the Spark parquet output (sorted-column canonical compare, the
  driver-gate semantics) so correctness at this sf comes free with the
  bench.

Usage: python3 scripts/bench_verify_duckdb.py <sfDir> <oracle_sql.json> \
           <out.json> [spark_out_dir] [sf01_times.json] [timeout_sec]
"""
import json
import os
import sys
import threading
import time

import duckdb


def canon_frames(got, exp):
    import pandas as pd
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    import pandas as pd
    for c in g.columns:
        a, b = g[c], e[c]
        na = a.isna() & b.isna()
        eq = (a == b) | na
        if not eq.all():
            i = int(eq.idxmin())
            return f"col {c} differs at {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
    return None


def main(sf_dir, sql_path, out_path, spark_dir=None, base_path=None,
         timeout_sec="900"):
    timeout_sec = float(timeout_sec)
    sql = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute("PRAGMA memory_limit='80GB'")
    con.execute("PRAGMA temp_directory='/tmp/duckspill'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    base = {}
    if base_path and os.path.exists(base_path):
        base = json.load(open(base_path))
    names = sorted(sql, key=lambda n: (base.get(n, 0.0), n))

    results, compare, timed_out = {}, {}, []
    # Resume: re-load any queries already banked in the partial file so a
    # crashed run re-executes only what's missing.
    ppath = out_path + ".partial.jsonl"
    if os.path.exists(ppath):
        for ln in open(ppath):
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            results[rec["q"]] = rec["sec"]
            if rec.get("cmp") is not None:
                compare[rec["q"]] = rec["cmp"]
            if rec.get("timed_out"):
                timed_out.append(rec["q"])
        done = set(results)
        if done:
            print(f"[resume] {len(done)} queries already banked, "
                  f"{len([n for n in names if n not in done])} to run",
                  flush=True)
        names = [n for n in names if n not in done]

    partial = open(ppath, "a")

    def run_one(stmt):
        """Execute, streaming the result away in chunks; returns rowcount
        or raises (duckdb.InterruptException on timeout)."""
        timer = threading.Timer(timeout_sec, con.interrupt)
        timer.start()
        try:
            cur = con.execute(stmt)
            n = 0
            while True:
                chunk = cur.fetchmany(8192)
                if not chunk:
                    return n
                n += len(chunk)
        finally:
            timer.cancel()

    for name in names:
        stmt = sql[name]
        # warmup execution; doubles as the correctness run when comparing
        t0 = time.time()
        try:
            if spark_dir is not None:
                timer = threading.Timer(timeout_sec, con.interrupt)
                timer.start()
                try:
                    exp = con.execute(stmt).fetchdf()
                finally:
                    timer.cancel()
                import pandas as pd
                spath = os.path.join(spark_dir, name)
                if os.path.isdir(spath):
                    compare[name] = canon_frames(pd.read_parquet(spath), exp) or "PASS"
                else:
                    compare[name] = "no spark output"
                del exp
            else:
                run_one(stmt)
            warm = time.time() - t0
            # timed execution
            t1 = time.time()
            run_one(stmt)
            dt = time.time() - t1
        except KeyboardInterrupt:
            raise
        except Exception as e:
            dt = time.time() - t0
            kind = type(e).__name__
            is_timeout = "Interrupt" in kind
            if is_timeout:
                timed_out.append(name)
            results[name] = round(dt, 4)
            rec = {"q": name, "sec": round(dt, 4),
                   "err": None if is_timeout else f"{kind}: {str(e)[:200]}",
                   "timed_out": is_timeout, "cmp": compare.get(name)}
            partial.write(json.dumps(rec) + "\n")
            partial.flush()
            print(json.dumps(rec), flush=True)
            continue
        results[name] = round(dt, 4)
        rec = {"q": name, "sec": round(dt, 4), "warm_sec": round(warm, 4),
               "cmp": compare.get(name)}
        partial.write(json.dumps(rec) + "\n")
        partial.flush()
        print(json.dumps(rec), flush=True)

    total = sum(results.values())
    line = {
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "queries": results, "sf": sf_dir, "timed_out": timed_out,
        "compare": compare,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps({"metric": line["metric"], "value": line["value"],
                      "timed_out": timed_out}), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
