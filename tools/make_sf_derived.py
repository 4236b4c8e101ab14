#!/usr/bin/env python3
"""Derive a larger scale factor from an existing testdata dir (the
driver ships sf0.001/0.01/0.1 only) by replicating every table
`copies` times with coherent key shifts — foreign keys (orders→
customer, lineitem→orders/part/supplier, events→users) stay valid, the
fixed dims (region, nation) are untouched, and each document copy gets
a per-copy suffix token so replicas are NEAR-dups (realistic for the
dedup family) instead of exact clones. Embeddings replicate unchanged
(exact-dup vectors — the worst case for embed-dedup bucket sizes).

Pure pyarrow so physical parquet types are preserved exactly —
events.ts must stay TIMESTAMP(NANOS) for graft.Tables' nanosAsLong
path.

Usage: python3 tools/make_sf_derived.py <srcDir> <dstDir> <copies>
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns to shift per copy (delta chosen above any real key)
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000,
                 "l_suppkey": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def derive(src, dst, copies):
    os.makedirs(dst, exist_ok=True)
    for table, shifts in SHIFTS.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if not shifts:  # fixed dims copy through once
            pq.write_table(t, f"{dst}/{table}.parquet")
            print(f"{table}: {t.num_rows} rows (dim, unreplicated)")
            continue
        parts = []
        for i in range(copies):
            tt = t
            for col, delta in shifts.items():
                idx = tt.schema.get_field_index(col)
                shifted = pc.add(tt.column(col), pa.scalar(i * delta, tt.schema.field(col).type))
                tt = tt.set_column(idx, tt.schema.field(col), shifted)
            if table == "documents" and i > 0:
                idx = tt.schema.get_field_index("text")
                mutated = pc.binary_join_element_wise(
                    tt.column("text").combine_chunks(), pa.scalar(f"c{i}"), " ")
                tt = tt.set_column(idx, tt.schema.field("text"), mutated)
            parts.append(tt)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"{table}: {out.num_rows} rows ({copies}x)")


if __name__ == "__main__":
    derive(sys.argv[1], sys.argv[2], int(sys.argv[3]))
