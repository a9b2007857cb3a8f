"""Maximal independent set by deterministic Luby rounds.

Reference semantics analog: none (the reference has no graph
analytics); this is the classic symmetry-breaking primitive over the
KG — an MIS of the co-occurrence graph is a maximal set of pairwise
NON-co-occurring entities (a diversity cover: every excluded entity
co-occurs with a chosen one), and the same round structure underlies
distributed graph coloring and matching.

Algorithm (Luby 1986, the canonical distributed MIS): every live node
draws a priority; a node joins the set iff its priority beats every
live neighbor's, winners and their neighbors leave the graph, repeat.
O(log n) rounds with high probability.  Priorities here are
``md5(seed | round | node)`` with the node name appended — a total
order that is a pure function of (graph, seed), so the OUTPUT SET is
deterministic under any partitioning, any plan, and retries (no RNG
state anywhere).

Scale shape, per round: the live-node key table is node-bounded (one
row per live node, shrinking every round) — ONE size-adaptive lookup
join attaches neighbor keys to the live edges, ONE
``groupby(src).Min`` reduces each node's best neighbor key, ONE
lookup join + vectorized compare picks the winners, and TWO semi/anti
joins shrink the node and edge sets.  Driver state: scalar counts.
"""

from __future__ import annotations

import hashlib
import logging

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

logger = logging.getLogger(__name__)

_SEP = "\x1f"


def _node_table(triples: Dataset) -> Dataset:
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("subj").combine_chunks(),
                        batch.column("obj").combine_chunks(),
                    ]
                )
            }
        )

    return (
        _hagg_auto(triples.select_columns(["subj", "obj"])
        .map_batches(endpoints, batch_format="pyarrow"), "node", [('', 'count_all', '_n')])
        .select_columns(["node"])
    )


def mis_dataset(
    triples: Dataset,
    seed: int = 42,
    max_rounds: int = 200,
    broadcast_limit: int | None = None,
) -> Dataset:
    """Deterministic-Luby maximal independent set of the undirected
    graph in ``triples`` (self-loops ignored, multi-edges collapsed).

    Output: one ``node`` column, sorted — an INDEPENDENT (no edge
    inside the set) and MAXIMAL (every outside node has a neighbor
    inside) set, unique for a given (graph, seed).
    """
    from renard_ray.ops.graphstats import _distinct_adjacency
    from renard_ray.ops.relational import (
        broadcast_lookup_join,
        broadcast_semi_join,
    )

    limit = 5_000_000 if broadcast_limit is None else broadcast_limit
    empty = pa.table({"node": pa.array([], pa.string())})

    nodes = _node_table(triples).materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(empty)
    edges = _distinct_adjacency(triples)  # both directions, no loops
    if edges is None:  # no surviving edge: every node is independent
        return nodes.sort("node")
    edges = edges.materialize()

    live = nodes
    chosen: list[Dataset] = []

    for rnd in range(max_rounds):
        if live.count() == 0:
            break
        if edges.count() == 0:  # all remaining live nodes are isolated
            chosen.append(live)
            break

        def key_batch(batch: pa.Table, _rnd=rnd) -> pa.Table:
            ns = batch.column("node").to_pylist()
            ks = [
                hashlib.md5(f"{seed}|{_rnd}|{n}".encode("utf-8")).hexdigest()
                + _SEP
                + n
                for n in ns
            ]
            return pa.table(
                {"node": batch.column("node"), "k": pa.array(ks, pa.string())}
            )

        nodes_k = live.map_batches(key_batch, batch_format="pyarrow").materialize()

        # every node's best (minimum) live-neighbor key
        kd = nodes_k.map_batches(
            lambda b: pa.table({"nbr": b.column("node"), "kd": b.column("k")}),
            batch_format="pyarrow",
        )
        mn = (
            _hagg_auto(broadcast_lookup_join(
                edges, kd, on="dst", right_on="nbr", payload=["kd"], limit=limit
            ), "src", [('kd', 'min', 'kd')])
        )
        with_mn = broadcast_lookup_join(
            nodes_k, mn, on="node", right_on="src", payload=["kd"], limit=limit
        )
        beat = with_mn.map_batches(
            lambda b: b.filter(pc.less(b.column("k"), b.column("kd"))).select(
                ["node"]
            ),
            batch_format="pyarrow",
        )
        isolated = broadcast_semi_join(
            live, edges, on="node", right_on="src", anti=True, limit=limit
        )
        winners = beat.union(isolated).materialize()
        n_win = winners.count()
        logger.info("mis round %d: %d winners", rnd, n_win)
        if n_win == 0:
            # cannot happen: the globally minimal live key always beats
            # every neighbor — guard against a logic regression
            raise RuntimeError("mis: zero winners in a round with live edges")
        chosen.append(winners)

        nbrs = broadcast_semi_join(
            edges, winners, on="src", right_on="node", limit=limit
        ).map_batches(
            lambda b: pa.table({"node": b.column("dst")}), batch_format="pyarrow"
        )
        removed = winners.union(nbrs)
        live = broadcast_semi_join(
            live, removed, on="node", anti=True, limit=limit
        ).materialize()
        edges = broadcast_semi_join(
            broadcast_semi_join(
                edges, live, on="src", right_on="node", limit=limit
            ),
            live,
            on="dst",
            right_on="node",
            limit=limit,
        ).materialize()
    else:
        raise RuntimeError(
            f"mis: not converged after {max_rounds} rounds — with hashed "
            "priorities the expected round count is O(log n); this "
            "indicates a bug or an adversarial-hash input"
        )

    if not chosen:
        return ray.data.from_arrow(empty)
    out = chosen[0]
    for c in chosen[1:]:
        out = out.union(c)
    return out.sort("node")
