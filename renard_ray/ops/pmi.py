"""Pointwise mutual information over a weighted pair table.

PMI(u, v) = ln( p(u,v) / (p(u) p(v)) ) ranks how much more often a
pair co-occurs than independence predicts — the classic association
score for entity co-occurrence graphs (Church & Hanks 1990) and a
standard KG edge-weighting signal.

Scale shape: the only all-to-all is ONE ``groupby(u, v)`` over the
raw pair stream (with per-batch combine, so hub pairs collapse before
the exchange).  The two marginal tables are derived FROM the
aggregated pair table (never a second scan of the input) and attached
via the shared size-adaptive lookup join — broadcast ``index_in``
while a marginal fits the row budget, hash join past it.  Nothing
pair- or node-sized lands on the driver.

Exactness: the emitted score is the integer floor ratio

    pmi_ratio_ppm = (pair_n * total_n * scale) // (u_n * v_n)

a monotone transform of PMI (pmi = ln(ratio / scale)) kept in exact
int64 arithmetic so the result hashes identically to a DuckDB oracle
(float ``ln`` reprs differ between engines; integer division does
not).  The numerator bound is asserted, not silently wrapped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from renard_ray.ops.relational import broadcast_lookup_join

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

_I64_MAX = (1 << 63) - 1


def pmi_dataset(
    pairs: Dataset,
    u_col: str,
    v_col: str,
    n_col: str | None = None,
    min_pair_n: int = 1,
    scale: int = 1_000_000,
    broadcast_limit: int | None = None,
) -> Dataset:
    """PMI ratio per distinct (u, v) pair.

    ``pairs``: one row per observation — or per pre-aggregated pair
    when ``n_col`` names an integer count column.  Output columns:
    ``u, v, pair_n, u_n, v_n, total_n, pmi_ratio_ppm`` (all int64
    except the key columns).
    """

    def to_counts(batch: pa.Table) -> pa.Table:
        n = (
            pc.cast(pc.round(batch.column(n_col)), pa.int64())
            if n_col is not None
            else pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
        t = pa.table(
            {"u": batch.column(u_col), "v": batch.column(v_col), "n": n}
        )
        # per-batch combine: hub pairs collapse before the shuffle
        g = t.group_by(["u", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "v", "n"])

    agg = (
        _hagg_auto(pairs.map_batches(to_counts, batch_format="pyarrow"), ["u", "v"], [('n', 'sum', 'pair_n')])
        .materialize()
    )

    total = agg.aggregate(Sum("pair_n", alias_name="t"))
    total_n = int(total["t"] or 0)
    if total_n == 0:
        empty = pa.schema(
            [
                ("u", pa.string()),
                ("v", pa.string()),
                ("pair_n", pa.int64()),
                ("u_n", pa.int64()),
                ("v_n", pa.int64()),
                ("total_n", pa.int64()),
                ("pmi_ratio_ppm", pa.int64()),
            ]
        )
        import ray

        return ray.data.from_arrow(empty.empty_table())

    # marginals from the aggregated pair table (node-bounded rows)
    u_marg = _hagg_auto(agg, "u", [('pair_n', 'sum', 'u_n')])
    v_marg = _hagg_auto(agg, "v", [('pair_n', 'sum', 'v_n')])

    out = agg
    if min_pair_n > 1:
        out = out.filter(expr=f"pair_n >= {int(min_pair_n)}")
    out = broadcast_lookup_join(
        out, u_marg, on="u", right_on="u", payload=["u_n"],
        limit=broadcast_limit,
    )
    out = broadcast_lookup_join(
        out, v_marg, on="v", right_on="v", payload=["v_n"],
        limit=broadcast_limit,
    )

    def score(batch: pa.Table) -> pa.Table:
        p = batch.column("pair_n").to_numpy(zero_copy_only=False).astype(np.int64)
        un = batch.column("u_n").to_numpy(zero_copy_only=False).astype(np.int64)
        vn = batch.column("v_n").to_numpy(zero_copy_only=False).astype(np.int64)
        if p.size:
            # overflow is a hard error, never a silent wrap: at corpus
            # scale the caller must lower ``scale`` (ranking is
            # invariant to it)
            hi = int(p.max())
            if hi * total_n > _I64_MAX // scale:
                raise ValueError(
                    f"pmi_dataset: pair_n*total_n*scale overflows int64 "
                    f"(max pair_n={hi}, total_n={total_n}, scale={scale}) "
                    f"— lower `scale`"
                )
        ratio = (p * np.int64(total_n) * np.int64(scale)) // (un * vn)
        return pa.table(
            {
                "u": batch.column("u"),
                "v": batch.column("v"),
                "pair_n": pa.array(p, pa.int64()),
                "u_n": pa.array(un, pa.int64()),
                "v_n": pa.array(vn, pa.int64()),
                "total_n": pa.array(
                    np.full(len(p), total_n, dtype=np.int64), pa.int64()
                ),
                "pmi_ratio_ppm": pa.array(ratio, pa.int64()),
            }
        )

    return out.map_batches(score, batch_format="pyarrow")


def pmi_table(pairs_df, u_col, v_col, n_col=None, min_pair_n=1, scale=1_000_000):
    """Small-data pandas oracle (exact Python-int arithmetic)."""
    import pandas as pd

    df = pairs_df[[u_col, v_col]].copy()
    df["n"] = (
        pairs_df[n_col].round().astype(int) if n_col is not None else 1
    )
    agg = df.groupby([u_col, v_col], as_index=False)["n"].sum()
    agg = agg.rename(columns={u_col: "u", v_col: "v", "n": "pair_n"})
    total_n = int(agg["pair_n"].sum())
    u_marg = agg.groupby("u")["pair_n"].sum().to_dict()
    v_marg = agg.groupby("v")["pair_n"].sum().to_dict()
    agg = agg[agg["pair_n"] >= min_pair_n].reset_index(drop=True)
    rows = []
    for r in agg.itertuples(index=False):
        u_n, v_n = int(u_marg[r.u]), int(v_marg[r.v])
        rows.append(
            (
                r.u,
                r.v,
                int(r.pair_n),
                u_n,
                v_n,
                total_n,
                (int(r.pair_n) * total_n * scale) // (u_n * v_n),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["u", "v", "pair_n", "u_n", "v_n", "total_n", "pmi_ratio_ppm"],
    )
