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


def skew_aware_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 8,
    hot_threshold: int = 100_000,
) -> Dataset:
    """Hash join that survives hot keys ("salt hot keys" at 100 TB).

    A plain hash join sends every row of a key to ONE partition; a hub
    key (a celebrity entity, a null-ish default value) turns that
    partition into the straggler.  Plan:

    1. one key-column pass over the LEFT side counts per-key rows; keys
       over ``hot_threshold`` form the (small — by definition there can
       be few keys that big) hot set;
    2. hot-key rows on the RIGHT are collected and broadcast via
       ``ray.put`` (bounded: hot keys are few, and the right side of a
       join is dimension-like for hub keys); hot LEFT rows join against
       the broadcast map in a vectorized per-batch pass — no shuffle,
       perfectly spread;
    3. cold rows of both sides go through the ordinary hash join;
    4. union.  Row-identical to the plain join (inner semantics).
    """
    import ray
    from ray.data.aggregate import Count

    right_on = right_on or on

    # output schema is column-name-sorted on EVERY path, so the result
    # shape never depends on whether hot keys existed in the data
    out_cols = sorted(set(left.schema().names) | (set(right.schema().names) - {right_on}))

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.select([c for c in out_cols if c in batch.column_names])

    hot = (
        left.select_columns([on])
        .groupby(on)
        .aggregate(Count(alias_name="n"))
        .filter(expr=f"n > {hot_threshold}")
        .take_all()
    )
    if not hot:
        return left.join(
            right, join_type="inner", num_partitions=num_partitions,
            on=(on,), right_on=(right_on,),
        ).map_batches(order_cols, batch_format="pyarrow")
    hot_keys = pa.array(sorted(r[on] for r in hot))
    hot_ref = ray.put(hot_keys)

    def split(batch: pa.Table, col: str, keep_hot: bool) -> pa.Table:
        hk = ray.get(hot_ref)
        hit = pc.is_valid(pc.index_in(batch.column(col).combine_chunks(), value_set=hk))
        return batch.filter(hit if keep_hot else pc.invert(hit))

    cold = left.map_batches(
        split, fn_kwargs={"col": on, "keep_hot": False}, batch_format="pyarrow"
    ).join(
        right.map_batches(
            split, fn_kwargs={"col": right_on, "keep_hot": False},
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )

    # broadcast the RIGHT rows of hot keys (few keys -> bounded table)
    hot_right_batches = [
        b
        for b in right.map_batches(
            split, fn_kwargs={"col": right_on, "keep_hot": True},
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not hot_right_batches:
        # hot keys have no right-side match (inner join)
        return cold.map_batches(order_cols, batch_format="pyarrow")
    hot_right = pa.concat_tables(hot_right_batches)
    hr_ref = ray.put(hot_right)

    def bcast_join(batch: pa.Table) -> pa.Table:
        hr = ray.get(hr_ref)
        return batch.join(hr, keys=[on], right_keys=[right_on], join_type="inner")

    hot_left = left.map_batches(
        split, fn_kwargs={"col": on, "keep_hot": True}, batch_format="pyarrow"
    )
    hot_joined = hot_left.map_batches(bcast_join, batch_format="pyarrow")

    # normalize column order on both branches before the union (the
    # hash-join and pyarrow-join output orders differ)
    return cold.map_batches(order_cols, batch_format="pyarrow").union(
        hot_joined.map_batches(order_cols, batch_format="pyarrow")
    )
