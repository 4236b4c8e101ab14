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

Usage: python3 tools/make_sf_derived.py <srcDir> <dstDir> <copies> [hotFrac]

`hotFrac` (e.g. 0.2) deterministically reassigns that fraction of all
EVENT rows (event_id % round(1/hotFrac) == 0) to one hot user
(user_id 4242424242): a single key carrying ~hotFrac of the events
table, so AQE skew handling has to fire inside the real
sessionize/paths/funnel pipelines, not just a planted-join spec.
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


HOT_USER = 4_242_424_242


def derive(src, dst, copies, hot_frac=0.0):
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
        if table == "events" and hot_frac > 0:
            mod = max(2, round(1.0 / hot_frac))
            uidx = out.schema.get_field_index("user_id")
            utype = out.schema.field("user_id").type
            is_hot = pc.equal(
                pc.subtract(out.column("event_id"),
                            pc.multiply(pc.divide(out.column("event_id"),
                                                  pa.scalar(mod, pa.int64())),
                                        pa.scalar(mod, pa.int64()))),
                pa.scalar(0, pa.int64()))
            hot_users = pc.if_else(is_hot, pa.scalar(HOT_USER, utype),
                                   out.column("user_id").combine_chunks())
            out = out.set_column(uidx, out.schema.field("user_id"), hot_users)
            n_hot = pc.sum(pc.cast(is_hot, pa.int64())).as_py()
            print(f"events: hot user {HOT_USER} takes {n_hot} rows "
                  f"(~{n_hot / out.num_rows:.0%})")
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"{table}: {out.num_rows} rows ({copies}x)")


if __name__ == "__main__":
    hot = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    derive(sys.argv[1], sys.argv[2], int(sys.argv[3]), hot)
