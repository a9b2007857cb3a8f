"""Skew-aware (salted) aggregation.

North-rule requirement: "skewed entities (hub mentions) are handled
with salted groupby keys and explicit repartitioning".  Two layers in
this engine:

1. **Map-side partial aggregation** (``pipelines/kg.py::_partial_agg``)
   — every batch combines its rows per key before the shuffle, so a hub
   key contributes at most one row per block.  This alone removes most
   hot-key pressure and is always on.
2. **Salted two-phase aggregate** (here) — for the residual case where
   even one-row-per-block per key overloads a single reducer (millions
   of blocks, one global hub key): phase 1 groups on
   ``(key, hash(row) % n_salts)`` spreading the hub across ``n_salts``
   reducers; phase 2 re-groups the (tiny) salted partials on the bare
   key.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def salted_groupby_sum(
    ds: Dataset,
    key_cols: list[str],
    value_cols: list[str],
    n_salts: int = 16,
) -> Dataset:
    """Two-phase salted ``groupby(key_cols).sum(value_cols)``.

    Result is identical to the unsalted groupby (sums are associative);
    the shuffle distributes each hot key over ``n_salts`` partitions.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt: spread rows of the same key
        n = batch.num_rows
        salt = pc.cast(
            pc.bit_wise_and(
                pa.array(range(n), pa.int64()), pa.scalar(n_salts - 1, pa.int64())
            ),
            pa.int32(),
        )
        return batch.append_column("_salt", salt)

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(key_cols + ["_salt"])
        .aggregate(*[Sum(v, alias_name=v) for v in value_cols])
    )
    phase2 = phase1.groupby(key_cols).aggregate(
        *[Sum(v, alias_name=v) for v in value_cols]
    )
    return phase2
