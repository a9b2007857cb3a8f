"""Densest subgraph by distributed (1+eps)-greedy peeling.

Reference semantics analog: none (the reference has no graph
analytics); over the co-occurrence KG the densest subgraph is the
strongest "community core" — the entity set maximizing average
co-occurrence degree, the standard seed for community mining and
spam/bot-cluster detection on web graphs.

Algorithm (Charikar 2000's greedy peel, in the Bahmani-Kumar-
Vassilvitskii 2012 MapReduce form): per round, remove EVERY node of
degree <= (1+eps) x average degree and record the round's density
m/n; the best prefix over the peel is a 2(1+eps)-approximation of
the maximum-density subgraph.  Survivors per round number
< n/(1+eps) (degree-sum argument), so the loop is O(log_{1+eps} n)
rounds GUARANTEED — not probabilistic.

Determinism: the removal threshold ``floor((1+eps)*2m/n)`` is
computed with exact Python integers on the driver (eps is a
rational), the per-round removal set is a pure function of the
degree table, and the best round is chosen by exact cross-multiplied
fraction comparison (no float densities anywhere) with the EARLIEST
best round winning ties — output is a pure function of (graph, eps).

Scale shape, per round: ONE ``groupby(src).Count`` degree reduce over
the live (shrinking) edge list, ONE vectorized threshold filter, and
TWO semi joins to shrink the edges.  Driver state: scalar (n, m)
pairs per round and the removal-record Datasets' handles.
"""

from __future__ import annotations

import logging
from fractions import Fraction

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

logger = logging.getLogger(__name__)


def densest_subgraph_dataset(
    triples: Dataset,
    eps_num: int = 1,
    eps_den: int = 10,
    max_rounds: int = 400,
    broadcast_limit: int | None = None,
) -> Dataset:
    """Node set of the best-density peel prefix — a 2(1+eps)-approx
    densest subgraph of the undirected simple graph in ``triples``.

    Output: (node, n_nodes, m_edges, density_ppm) sorted by node; the
    three stat columns are constant (the chosen subgraph's size, its
    undirected edge count, and floor(1e6 * m/n))."""
    from renard_ray.ops.graphstats import _distinct_adjacency
    from renard_ray.ops.relational import broadcast_semi_join

    limit = 5_000_000 if broadcast_limit is None else broadcast_limit
    out_schema = pa.schema(
        [
            ("node", pa.string()),
            ("n_nodes", pa.int64()),
            ("m_edges", pa.int64()),
            ("density_ppm", pa.int64()),
        ]
    )
    edges = _distinct_adjacency(triples)  # both directions, loops dropped
    if edges is None:
        return ray.data.from_arrow(out_schema.empty_table())
    edges = edges.materialize()

    # removal record per round + (n, m) series; the subgraph at round t
    # is everyone removed at round >= t, so nothing node-sized ever
    # lives on the driver
    removed: list[Dataset] = []
    stats: list[tuple[int, int]] = []  # (n, m) at round START

    for rnd in range(max_rounds):
        deg = (
            _hagg_auto(edges, "src", [('', 'count_all', 'deg')]).materialize()
        )
        n = deg.count()
        if n == 0:
            break
        m2 = edges.count()  # directed rows = 2m
        stats.append((n, m2 // 2))

        # exact integer threshold: deg <= floor((1+eps) * 2m / n)
        thr = ((eps_den + eps_num) * m2) // (eps_den * n)
        # just the node column: reconstruction indexes `removed` by
        # list position, so a per-row round column would be dead weight
        victims = deg.map_batches(
            lambda b, t=thr: (
                lambda f: pa.table({"node": f.column("src")})
            )(b.filter(pc.less_equal(b.column("deg"), pa.scalar(t, pa.int64())))),
            batch_format="pyarrow",
        ).materialize()
        n_out = victims.count()
        logger.info(
            "densest round %d: n=%d m=%d thr=%d removing %d", rnd, n, m2 // 2,
            thr, n_out,
        )
        if n_out == 0:
            # threshold >= max degree always removes someone (avg-degree
            # bound); an empty removal set means every node beat the
            # threshold, which the degree-sum argument forbids
            raise RuntimeError("densest: empty removal round — logic bug")
        removed.append(victims)
        if n_out == n:
            break
        edges = broadcast_semi_join(
            broadcast_semi_join(
                edges, victims, on="src", right_on="node", anti=True,
                limit=limit,
            ),
            victims,
            on="dst",
            right_on="node",
            anti=True,
            limit=limit,
        ).materialize()
    else:
        raise RuntimeError(
            f"densest: not converged after {max_rounds} rounds — survivors "
            "shrink by 1/(1+eps) per round, so this indicates a bug"
        )

    if not stats:
        return ray.data.from_arrow(out_schema.empty_table())

    # best round by exact fraction m/n, EARLIEST wins ties
    best_rnd = 0
    best = Fraction(stats[0][1], stats[0][0])
    for i, (n, m) in enumerate(stats[1:], 1):
        f = Fraction(m, n)
        if f > best:
            best, best_rnd = f, i
    n_best, m_best = stats[best_rnd]

    # subgraph at best round = everyone removed at round >= best_rnd
    keep = removed[best_rnd]
    for d in removed[best_rnd + 1:]:
        keep = keep.union(d)

    def finish(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table(
            {
                "node": batch.column("node"),
                "n_nodes": pa.array([n_best] * k, pa.int64()),
                "m_edges": pa.array([m_best] * k, pa.int64()),
                "density_ppm": pa.array(
                    [(10**6 * m_best) // n_best] * k, pa.int64()
                ),
            }
        )

    return (
        keep.select_columns(["node"])
        .map_batches(finish, batch_format="pyarrow")
        .sort("node")
    )
