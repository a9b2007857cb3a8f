"""Distributed connected components over an edge Dataset.

Used for cross-document alias canonicalization (SURVEY.md §2.4/§7.1.8):
nodes are distinct mention/name strings, edges are alias links; each
connected component is one global entity.

Two execution paths:

- ``driver`` — union-find on the driver over the *distinct* edge set
  (distinct-ed distributively first).  Distinct person-name pairs are
  orders of magnitude smaller than the corpus; up to ~10M pairs this is
  the fastest and simplest path.
- ``distributed`` — alternating large-star / small-star groupby rounds
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — public algorithm), all in Ray Data ``groupby``; converges in
  O(log n) rounds.  This is the 100 TB path: no single machine ever
  holds the full edge set.

``connected_components`` picks the path by the distinct-edge count
unless forced.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _distinct_edges(edges: Dataset, u: str = "u", v: str = "v") -> Dataset:
    """Normalize (min,max) order, drop self loops, distinct."""

    def norm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = batch.column(u)
        b = batch.column(v)
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.not_equal(lo, hi)
        t = pa.table({"u": pc.filter(lo, keep), "v": pc.filter(hi, keep)})
        # map-side dedup before the global distinct shuffle
        if t.num_rows:
            t = t.group_by(["u", "v"]).aggregate([]).select(["u", "v"])
        return t

    return (
        edges.map_batches(norm, batch_format="pyarrow")
        .groupby(["u", "v"])
        .count()
        .select_columns(["u", "v"])
    )


def _driver_cc(edges: Dataset) -> dict[str, str]:
    """Union-find over the distinct edge list pulled to the driver."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_format="pyarrow", batch_size=65536):
        for a, b in zip(batch.column("u").to_pylist(), batch.column("v").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # label = lexicographic min, deterministic
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
                parent.setdefault(lo, lo)
    return {x: find(x) for x in list(parent)}


def _star_round(edges: Dataset, large: bool) -> Dataset:
    """One large-star or small-star round (groupby node)."""

    def expand(batch: pa.Table) -> pa.Table:
        # emit both directions so each node sees its full neighborhood
        u = batch.column("u")
        v = batch.column("v")
        return pa.table(
            {
                "node": pa.chunked_array([u, v]).combine_chunks(),
                "nbr": pa.chunked_array([v, u]).combine_chunks(),
            }
        )

    def star(group: pd.DataFrame) -> pd.DataFrame:
        node = group["node"].iloc[0]
        nbrs = group["nbr"]
        m = min(nbrs.min(), node)
        if large:
            # attach strictly-greater neighbors to the minimum
            out_v = [n for n in nbrs if n > node]
        else:
            # attach ≤-neighbors (and self) to the minimum
            out_v = [n for n in nbrs if n <= node and n != m]
            if node != m:
                out_v.append(node)
        out_v = [x for x in set(out_v) if x != m]
        return pa.table(
            {
                "u": pa.array([m] * len(out_v), pa.string()),
                "v": pa.array(out_v, pa.string()),
            }
        )

    both = edges.map_batches(expand, batch_format="pyarrow")
    return both.groupby("node").map_groups(star, batch_format="pandas")


def _distributed_cc(edges: Dataset, max_rounds: int = 25) -> Dataset:
    """Alternating star rounds until the edge set is stable.

    Returns a (node, label) Dataset.  Each round is two groupby
    shuffles + one convergence check (count + checksum aggregate).
    """
    cur = edges
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_rounds):
        cur = _star_round(cur, large=True)
        cur = _star_round(cur, large=False)
        cur = _distinct_edges(cur, "u", "v").materialize()

        def sig_batch(batch: pa.Table) -> pa.Table:
            import zlib

            # deterministic order-insensitive signature (process-stable,
            # unlike python hash() which is seed-salted per worker)
            s = sum(
                zlib.crc32(a.encode() + b"\x00" + b.encode())
                for a, b in zip(
                    batch.column("u").to_pylist(), batch.column("v").to_pylist()
                )
            ) & ((1 << 61) - 1)
            return pa.table({"n": [batch.num_rows], "s": [s]})

        parts = cur.map_batches(sig_batch, batch_format="pyarrow").to_pandas()
        sig = (int(parts["n"].sum()), int(parts["s"].sum()) & ((1 << 61) - 1))
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence every edge is (component_min, member)
    def to_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("v"), "label": batch.column("u")})

    members = cur.map_batches(to_labels, batch_format="pyarrow")

    def root_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("u"), "label": batch.column("u")})

    roots = cur.map_batches(root_rows, batch_format="pyarrow")
    return (
        members.union(roots)
        .groupby("node")
        .min("label")
        .map_batches(
            lambda b: pa.table({"node": b.column("node"), "label": b.column("min(label)")}),
            batch_format="pyarrow",
        )
    )


def connected_components(
    edges: Dataset,
    u: str = "u",
    v: str = "v",
    mode: str = "auto",
    driver_limit: int = 5_000_000,
) -> tuple[dict[str, str] | None, Dataset | None]:
    """Label connected components of the (string-keyed) edge Dataset.

    Returns ``(label_map, label_ds)`` — exactly one is non-None:
    the driver path returns a plain dict (broadcastable via
    ``ray.put``); the distributed path returns a (node, label) Dataset.
    """
    dedup = _distinct_edges(edges, u, v).materialize()
    if mode == "auto":
        mode = "driver" if dedup.count() <= driver_limit else "distributed"
    if mode == "driver":
        return _driver_cc(dedup), None
    return None, _distributed_cc(dedup)
