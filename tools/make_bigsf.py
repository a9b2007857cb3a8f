"""Synthesize a 10x-scale test-table directory for the scale smoke
(VERDICT r4 task 5): replicate every sf0.1 fact table R times with
consistent key offsets (FKs shifted together, so join semantics are
preserved and every replica is a self-contained copy of the world),
dimensions (nation/region) copied once.  Deterministic; written as one
parquet file per table with many row groups so Ray's read fans out.

Usage::

    python tools/make_bigsf.py [src_sf_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000  # > every key in sf0.1

# table -> key columns that shift by replica * OFF
SHIFT = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY = ["nation", "region"]


def build(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in COPY:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} (copied)")
    for name, keys in SHIFT.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        reps = []
        for i in range(replicas):
            r = t
            for k in keys:
                idx = r.column_names.index(k)
                col = pc.add(
                    pc.cast(r.column(k), pa.int64()), pa.scalar(i * OFF, pa.int64())
                )
                r = r.set_column(idx, k, col)
            reps.append(r)
        big = pa.concat_tables(reps)
        rows_per_group = max(10_000, big.num_rows // 64)
        pq.write_table(
            big, f"{dst}/{name}.parquet", row_group_size=rows_per_group
        )
        print(f"{name}: {t.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/renard_ray_bigsf"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, replicas)
