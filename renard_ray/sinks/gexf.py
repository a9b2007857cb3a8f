"""GEXF export + networkx bridge for AGGREGATED triple tables.

Capability parity with the reference's graph exports:
- ``export_graph_to_gexf`` (``renard/pipeline/core.py:244-282``),
- dynamic-graph Gephi export with interval ``dweight`` attributes
  (``renard/graph_utils.py:108-167``),
- ``cumulative_graph`` (``graph_utils.py:11-42``) — provided on the
  aggregated table (block-indexed running sum).

These operate on the FINAL aggregated triples (small by construction:
distinct entity pairs, not corpus-sized), so a driver-side networkx
graph is the right tool — the heavy lifting happened in the
distributed aggregation.
"""

from __future__ import annotations

import networkx as nx
import pandas as pd


def triples_to_nx(triples: pd.DataFrame, directed_preds: tuple[str, ...] = ("mentions",)) -> nx.MultiDiGraph | nx.Graph:
    """Aggregated triple rows -> a networkx graph.  Undirected unless
    any directed predicate is present (then a MultiDiGraph with
    per-pred edges)."""
    use_directed = any(p in directed_preds for p in triples["pred"].unique())
    G: nx.Graph = nx.MultiDiGraph() if use_directed else nx.Graph()
    for r in triples.itertuples():
        attrs = {"pred": r.pred, "weight": float(r.weight)}
        if getattr(r, "polarity", 0.0):
            attrs["polarity"] = float(r.polarity)
        if use_directed:
            G.add_edge(r.subj, r.obj, key=r.pred, **attrs)
        else:
            if G.has_edge(r.subj, r.obj):
                G[r.subj][r.obj]["weight"] += attrs["weight"]
            else:
                G.add_edge(r.subj, r.obj, **attrs)
    return G


def cumulative_blocks(triples: pd.DataFrame) -> list[pd.DataFrame]:
    """Running sum over the ``block_id`` dimension of a dynamic triple
    table (reference ``cumulative_graph``, ``graph_utils.py:11-42``)."""
    blocks = sorted(b for b in triples["block_id"].unique() if b >= 0)
    acc: dict[tuple, list[float]] = {}
    out = []
    for b in blocks:
        cur = triples[triples["block_id"] == b]
        for r in cur.itertuples():
            key = (r.subj, r.pred, r.obj)
            if key not in acc:
                acc[key] = [0.0, 0.0]
            acc[key][0] += float(r.weight)
            acc[key][1] += float(getattr(r, "polarity", 0.0))
        out.append(
            pd.DataFrame(
                [
                    {"subj": s, "pred": p, "obj": o, "block_id": b,
                     "weight": w, "polarity": pol}
                    for (s, p, o), (w, pol) in acc.items()
                ]
            )
        )
    return out


def write_gexf(triples: pd.DataFrame, path: str) -> None:
    """Static GEXF export of an aggregated triple table."""
    G = triples_to_nx(triples)
    # networkx gexf writer needs str-keyed attrs only
    nx.write_gexf(G, path)


def write_dynamic_gexf(triples: pd.DataFrame, path: str) -> None:
    """Dynamic (block-indexed) export: edges carry Gephi interval
    ``dweight``-style attributes — (reference
    ``dynamic_graph_to_gephi_graph``, ``graph_utils.py:108-167``)."""
    blocks = cumulative_blocks(triples)
    G = nx.Graph()
    for b_i, frame in enumerate(blocks):
        for r in frame.itertuples():
            if not G.has_edge(r.subj, r.obj):
                G.add_edge(r.subj, r.obj, dweight=[])
            G[r.subj][r.obj]["dweight"].append([float(r.weight), float(b_i), float(b_i + 1)])
    # serialize interval lists as spells strings (gexf-compatible attr)
    for u, v, d in G.edges(data=True):
        d["dweight"] = ";".join(f"{w}@[{s},{e})" for w, s, e in d["dweight"])
    nx.write_gexf(G, path)
