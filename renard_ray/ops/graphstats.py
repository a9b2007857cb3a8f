"""Analytics over the CONSTRUCTED knowledge graph — distributed.

The aggregated triple table of a 100 TB corpus is 10^8-10^9 rows, so
these never materialize it on the driver:

- ``degree_dataset`` / ``top_degree_dataset``: one edge->endpoint
  fan-out with per-batch partial aggregation, then a single
  ``groupby(node)`` — the degree shuffle carries (node, weight)
  pairs only.
- ``pagerank_dataset``: power iteration on the EDGE LIST (the public
  edge-centric PageRank formulation).  Per iteration: broadcast the
  rank vector (bounded by the canonical-entity vocabulary — the same
  broadcast-limit argument as ``pipelines.kg`` canonicalization), one
  streaming pass over the edges with per-batch combine, tiny driver
  merge of the per-node contributions.  Edges stream every iteration;
  nothing edge-sized ever lands on the driver.

``degree_table`` / ``pagerank`` (pandas) remain as the small-graph
ORACLES used by the tests; production queries use the Dataset forms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

_EDGE_COLS = ["subj", "obj", "weight"]


def degree_dataset(triples: Dataset) -> Dataset:
    """Weighted degree per node: (node, weighted_degree, n_edges).
    Pure shuffle-side aggregation; no driver materialization."""

    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("subj").combine_chunks(),
                        batch.column("obj").combine_chunks(),
                    ]
                ),
                "weight": pa.concat_arrays(
                    [
                        batch.column("weight").combine_chunks(),
                        batch.column("weight").combine_chunks(),
                    ]
                ),
            }
        )
        # per-batch combine before the shuffle (hub nodes repeat a lot)
        g = both.group_by(["node"]).aggregate([("weight", "sum"), ("node", "count")])
        return g.select(["node", "weight_sum", "node_count"]).rename_columns(
            ["node", "weight", "n"]
        )

    return (
        triples.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(
            Sum("weight", alias_name="weighted_degree"),
            Sum("n", alias_name="n_edges"),
        )
    )


def top_degree_dataset(triples: Dataset, k: int = 25) -> Dataset:
    """Top-k nodes by weighted degree (degree desc, node asc)."""
    return (
        degree_dataset(triples)
        .sort(["weighted_degree", "node"], descending=[True, False])
        .limit(k)
    )


def pagerank_dataset(
    triples: Dataset,
    damping: float = 0.85,
    iters: int = 30,
    k: int | None = None,
    broadcast_limit: int = 50_000_000,
) -> Dataset:
    """Deterministic power iteration over the undirected weighted edge
    list.  The per-node state (rank + out-weight) is vocabulary-sized
    and broadcast once per iteration; edges stream through
    ``map_batches`` with per-batch combine.  Raises if the vocabulary
    exceeds ``broadcast_limit`` (then you want a join-per-iteration
    variant — not needed below ~5x10^7 entities)."""
    edges = triples.select_columns(_EDGE_COLS).materialize()

    # out-weight per node (one shuffle)
    deg = degree_dataset(edges)
    out_w: dict[str, float] = {}
    for b in deg.iter_batches(batch_format="pyarrow", batch_size=None):
        for n, w in zip(
            b.column("node").to_pylist(), b.column("weighted_degree").to_pylist()
        ):
            out_w[n] = out_w.get(n, 0.0) + float(w)
    n_nodes = len(out_w)
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )
    if n_nodes > broadcast_limit:
        raise ValueError(
            f"pagerank_dataset: {n_nodes} nodes exceeds broadcast_limit="
            f"{broadcast_limit}; use a join-based rank exchange at this scale"
        )

    # stable node order for deterministic float accumulation
    nodes = sorted(out_w)
    ow = np.array([out_w[n] for n in nodes], dtype=np.float64)
    ow = np.maximum(ow, 1e-300)
    pr = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    keys_ref = ray.put(pa.array(nodes, pa.string()))

    def contrib_batch(batch: pa.Table, pr_ref) -> pa.Table:
        import pyarrow.compute as pc

        keys = ray.get(keys_ref)
        rank, outw = ray.get(pr_ref)
        si = pc.index_in(
            batch.column("subj").combine_chunks(), value_set=keys
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        oi = pc.index_in(
            batch.column("obj").combine_chunks(), value_set=keys
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        acc = np.zeros(len(rank), dtype=np.float64)
        # undirected: each edge pushes rank both ways
        np.add.at(acc, oi, rank[si] * w / outw[si])
        np.add.at(acc, si, rank[oi] * w / outw[oi])
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "i": pa.array(nz, pa.int64()),
                "c": pa.array(acc[nz], pa.float64()),
            }
        )

    for _ in range(iters):
        pr_ref = ray.put((pr, ow))
        parts: dict[int, list[float]] = {}
        for b in edges.map_batches(
            contrib_batch, fn_kwargs={"pr_ref": pr_ref}, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for i, c in zip(b.column("i").to_pylist(), b.column("c").to_pylist()):
                parts.setdefault(i, []).append(c)
        nxt = np.full(n_nodes, (1.0 - damping) / n_nodes, dtype=np.float64)
        # deterministic merge: sorted contribution lists per node
        for i, cs in parts.items():
            nxt[i] += damping * sum(sorted(cs))
        pr = nxt

    order = sorted(range(n_nodes), key=lambda i: (-pr[i], nodes[i]))
    if k is not None:
        order = order[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([nodes[i] for i in order], pa.string()),
                "rank": pa.array([round(float(pr[i]), 8) for i in order], pa.float64()),
            }
        )
    )


# ---------------------------------------------------- small-graph oracles


def degree_table(triples: pd.DataFrame) -> pd.DataFrame:
    deg: dict[str, float] = {}
    n_edges: dict[str, int] = {}
    for r in triples.itertuples():
        for node in (r.subj, r.obj):
            deg[node] = deg.get(node, 0.0) + float(r.weight)
            n_edges[node] = n_edges.get(node, 0) + 1
    rows = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "node": [n for n, _ in rows],
            "weighted_degree": [w for _, w in rows],
            "n_edges": [n_edges[n] for n, _ in rows],
        }
    )


def pagerank(
    triples: pd.DataFrame, damping: float = 0.85, iters: int = 30
) -> pd.DataFrame:
    nodes = sorted(set(triples["subj"]) | set(triples["obj"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    out_w = [0.0] * n
    edges: list[tuple[int, int, float]] = []
    for r in triples.itertuples():
        i, j, w = idx[r.subj], idx[r.obj], float(r.weight)
        edges.append((i, j, w))
        edges.append((j, i, w))
        out_w[i] += w
        out_w[j] += w
    pr = [1.0 / n] * n
    for _ in range(iters):
        nxt = [(1.0 - damping) / n] * n
        for i, j, w in edges:
            if out_w[i] > 0:
                nxt[j] += damping * pr[i] * (w / out_w[i])
        pr = nxt
    rows = sorted(zip(nodes, pr), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "node": [a for a, _ in rows],
            "rank": [round(b, 8) for _, b in rows],
        }
    )
