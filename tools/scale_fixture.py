#!/usr/bin/env python3
"""Scale the driver fixture for the sf1 scale-proof run (BASELINE.md §8).

Replicates each table with key offsets so join semantics survive
(customer/orders share the offset, lineitem follows orders, etc.).
Driver-side tooling only — the engine never depends on this.

  python3 tools/scale_fixture.py /root/testdata/sf0.1 /tmp/graft_sf1

Factors: fact tables x10 (sf1-equivalent), documents x100 — the text
family's small-input guards gate on 32 MB of scanned bytes, and x100
(~58 MB) is the first point the guards genuinely no-op, which is what
the run must demonstrate. Each document copy gets a one-token salt so
copies are NEAR-duplicates (jaccard ~0.97), exercising the LSH/verify
path rather than collapsing everything into exact-dup clusters.
Dimensions (region/nation) stay as-is. Embedding copies get small
gaussian noise (sigma 0.01, seeded) so they are near-duplicates rather
than bit-identical vectors — identical copies would make every LSH
bucket degenerate. Recall is measured separately at the original SF.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 1_000_000_000  # far above any fixture key

# Row-group cap for the scaled files. pyarrow's default (1M rows) wrote
# documents/events as a SINGLE row group, which serializes the parquet
# scan onto one task in both engines (row groups are the parallelism
# unit for Spark's split planning and DuckDB's scan scheduler alike) —
# an artifact of the single-file fixture, not of either engine: real
# 100 TB inputs arrive as thousands of files/row groups. 128k rows
# keeps every scaled fact table wide enough to saturate local[32].
ROW_GROUP_ROWS = 128 * 1024

TABLES = {
    "region": (1, []),
    "nation": (1, []),
    "supplier": (10, ["s_suppkey"]),
    "part": (10, ["p_partkey"]),
    "customer": (10, ["c_custkey"]),
    "orders": (10, ["o_orderkey", "o_custkey"]),
    "lineitem": (10, ["l_orderkey", "l_partkey", "l_suppkey"]),
    "events": (10, ["event_id", "user_id"]),
    "documents": (100, ["doc_id"]),
    "embeddings": (10, ["vec_id"]),
}


def scale_embeddings(src, dst, copies):
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    lab = np.array(t.column("label").to_pylist(), dtype=np.int32)
    rng = np.random.default_rng(42)
    parts = []
    for i in range(copies):
        e = emb if i == 0 else \
            emb + rng.normal(0, 0.01, emb.shape).astype(np.float32)
        parts.append(pa.table({
            "vec_id": pa.array(vid + i * OFFSET),
            "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
            "label": pa.array(lab)}))
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"),
                   row_group_size=ROW_GROUP_ROWS)
    print(f"{'embeddings':12} {t.num_rows:>9} -> {out.num_rows:>9} rows")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for name, (copies, keys) in TABLES.items():
        if name == "embeddings":
            scale_embeddings(src, dst, copies)
            continue
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            c = t
            if i > 0:
                for k in keys:
                    c = c.set_column(c.schema.get_field_index(k), k,
                                     pc.add(c.column(k), i * OFFSET))
                if name == "documents":
                    idx = c.schema.get_field_index("text")
                    salted = pc.binary_join_element_wise(
                        c.column("text").combine_chunks(),
                        pa.scalar(f"salt{i}"), " ")
                    c = c.set_column(idx, "text", salted)
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP_ROWS)
        print(f"{name:12} {t.num_rows:>9} -> {out.num_rows:>9} rows")


if __name__ == "__main__":
    main()
