"""Analytics over the CONSTRUCTED knowledge graph.

The aggregated triple table is small by construction (distinct entity
pairs), so these run on the driver after the distributed aggregation —
the standard shape: heavy lifting in the shuffle, analytics on the
result.

- ``degree_table``: weighted degree per node.
- ``pagerank``: deterministic power iteration (public algorithm) over
  the undirected weighted graph.
"""

from __future__ import annotations

import pandas as pd


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
