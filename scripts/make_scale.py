#!/usr/bin/env python3
"""Finish a graft.tools.ScaleGen output dir: re-type events.ts from
BIGINT epoch-nanos to parquet timestamp[ns] (Spark cannot write ns
timestamps; the engine reads ns columns as longs via nanosAsLong and
the DuckDB oracle needs TIMESTAMP_NS — this matches the driver's
sf0.1 physical schema exactly).

Usage: python3 scripts/make_scale.py <dir>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(d):
    p = f"{d}/events.parquet"
    t = pq.read_table(p)
    if pa.types.is_timestamp(t.schema.field("ts").type):
        print(f"[make_scale] {p}: ts already timestamp, nothing to do")
        return
    i = t.schema.get_field_index("ts")
    ts = t.column(i).cast(pa.timestamp("ns"))
    t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ts)
    pq.write_table(t, p)
    print(f"[make_scale] {p}: ts -> timestamp[ns], {t.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1])
