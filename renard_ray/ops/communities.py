"""Community detection over the constructed KG: synchronous label
propagation (Raghavan et al. 2007, the standard LPA formulation).

Semantics (fully deterministic):

- every node starts with its own name as label;
- each iteration, every node adopts the MOST FREQUENT label among its
  neighbors, ties broken by the lexicographically smallest label;
- updates are synchronous (all nodes vote on the previous round's
  labels) and the iteration count is fixed, so runs are reproducible.
  Synchronous LPA can oscillate on bipartite-ish structures — a fixed
  ``n_iter`` bounds that by construction; callers wanting convergence
  diagnostics can compare consecutive label tables.

Scale shape, per iteration: one streaming pass over the directed edge
list + one ``groupby`` shuffle keyed on (node, label).  The label
table is vocabulary-bounded (canonical entities), so it rides the same
size-adaptive policy as PageRank's rank vector: broadcast via
``ray.put`` + ``index_in`` while it fits the row budget, and a
``Dataset.join`` label exchange past it (nothing vocabulary-sized on
the driver in that regime).  The per-node argmax-with-tie reduce is a
single ``Min`` aggregate over an encoded (inverted count, label) sort
key — the same trick as the canonical-display-name pick in
``pipelines.kg``.

No counterpart in the reference (no graph analytics); sibling of
``ops/graphstats.py`` and ``ops/triangles.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

from .relational import _collect_small, _join_parts_bytes
from .triangles import _distinct_edges

_LABEL_LIMIT = 5_000_000  # label-table broadcast budget (rows)
_SEP = "\x1f"  # cannot appear in extracted entity names
_CNT_W = 13  # count field width; asserts below keep overflow loud


def _weighted_edges(triples: Dataset, weight_col: str | None) -> Dataset:
    """Undirected edge list (lo, hi, wi): wi = per-pair sum of
    round(weight * 100) as EXACT int64 centi-weights (order-independent
    sums -> deterministic votes), or 1 per distinct edge when
    ``weight_col`` is None."""
    if weight_col is None:
        return _distinct_edges(triples).map_batches(
            lambda b: b.append_column(
                "wi", pa.array([1] * b.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )

    def norm(batch: pa.Table) -> pa.Table:
        s, o = batch.column("subj"), batch.column("obj")
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        wi = pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(batch.column(weight_col), pa.float64()),
                    pa.scalar(100.0),
                ),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"lo": lo, "hi": hi, "wi": wi}).filter(
            pc.not_equal(lo, hi)
        )
        return (
            t.group_by(["lo", "hi"]).aggregate([("wi", "sum")])
            .rename_columns(["lo", "hi", "wi"])
        )

    return (
        triples.map_batches(norm, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Sum("wi", alias_name="wi"))
    )


def _pick_label(votes: Dataset) -> Dataset:
    """(node, lab) with lab = argmax count, ties -> min label.

    Encodes (10^13 - count, label) into one lexicographic key so a
    single ``Min`` aggregate resolves the argmax."""

    def encode(batch: pa.Table) -> pa.Table:
        cnt = batch.column("n")
        if pc.max(cnt).as_py() is not None and pc.max(cnt).as_py() >= 10**_CNT_W - 1:
            raise ValueError("label vote count overflows the encoded key")
        inv = pc.subtract(pa.scalar(10**_CNT_W - 1, pa.int64()), cnt)
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(inv, pa.string()), _CNT_W, "0"),
            batch.column("lab"),
            _SEP,
        )
        return pa.table({"node": batch.column("node"), "key": key})

    def decode(batch: pa.Table) -> pa.Table:
        lab = pc.utf8_slice_codeunits(
            batch.column("key"), _CNT_W + 1, 2**31 - 1
        )
        return pa.table({"node": batch.column("node"), "lab": lab})

    return (
        votes.map_batches(encode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("key", alias_name="key"))
        .map_batches(decode, batch_format="pyarrow")
    )


def label_propagation(
    triples: Dataset,
    n_iter: int = 10,
    *,
    weight_col: str | None = None,
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """(node, community) after ``n_iter`` synchronous LPA rounds over
    the undirected graph of the triple table.  With ``weight_col``,
    votes are weighted by the summed edge weight (exact integer
    centi-weights), the standard weighted-LPA variant — co-occurrence
    strength decides contested nodes instead of raw neighbor counts."""
    limit = _LABEL_LIMIT if broadcast_limit is None else broadcast_limit
    nparts = num_partitions or max(2, _join_parts_bytes(triples))
    edges = _weighted_edges(triples, weight_col).materialize()

    def both(batch: pa.Table) -> pa.Table:
        lo = batch.column("lo").combine_chunks()
        hi = batch.column("hi").combine_chunks()
        wi = batch.column("wi").combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([lo, hi]),
                "nbr": pa.concat_arrays([hi, lo]),
                "wi": pa.concat_arrays([wi, wi]),
            }
        )

    directed = edges.map_batches(
        both, batch_format="pyarrow"
    ).materialize()  # scanned every round

    # round 0: label(v) = v
    labels = directed.groupby("node").count().map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "lab": b.column("node")}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):
        lab_tab = _collect_small(labels, limit)
        if lab_tab is not None:
            ref = ray.put(lab_tab.combine_chunks())

            def vote(batch: pa.Table) -> pa.Table:
                lt = ray.get(ref)
                idx = pc.index_in(batch.column("nbr"), value_set=lt.column("node"))
                t = pa.table(
                    {
                        "node": batch.column("node"),
                        "lab": pc.take(lt.column("lab"), idx),
                        "wi": batch.column("wi"),
                    }
                )
                # per-batch combine before the shuffle
                return (
                    t.group_by(["node", "lab"])
                    .aggregate([("wi", "sum")])
                    .rename_columns(["node", "lab", "n"])
                )

            votes = directed.map_batches(vote, batch_format="pyarrow")
        else:
            lab_r = labels.map_batches(
                lambda b: b.rename_columns(["node_", "lab"]),
                batch_format="pyarrow",
            )
            nbr_lab = directed.join(
                lab_r, join_type="inner", num_partitions=nparts,
                on=("nbr",), right_on=("node_",),
            )
            votes = nbr_lab.map_batches(
                lambda b: (
                    b.select(["node", "lab", "wi"])
                    .group_by(["node", "lab"])
                    .aggregate([("wi", "sum")])
                    .rename_columns(["node", "lab", "n"])
                ),
                batch_format="pyarrow",
            )

        summed = votes.groupby(["node", "lab"]).aggregate(
            Sum("n", alias_name="n")
        )
        labels = _pick_label(summed).materialize()

    return labels.map_batches(
        lambda b: b.rename_columns(["node", "community"]),
        batch_format="pyarrow",
    )


def community_sizes(
    triples: Dataset, n_iter: int = 10, **kwargs
) -> Dataset:
    """Query surface: one row per community — (community, n_members),
    sorted by size desc then community asc."""
    labels = label_propagation(triples, n_iter, **kwargs)
    return (
        labels.groupby("community")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "community"], descending=[True, False])
    )


def label_propagation_oracle(
    edges: list[tuple[str, str]] | list[tuple[str, str, float]],
    n_iter: int = 10,
) -> dict[str, str]:
    """Small-graph oracle: the identical synchronous LPA in plain
    Python (independent of the distributed machinery).  Edges may
    carry a weight as a third element (centi-weight vote semantics)."""
    adj: dict[str, dict[str, int]] = {}
    for e in edges:
        u, v = e[0], e[1]
        if u == v:
            continue
        if len(e) > 2:  # weighted: per-pair centi-weight sums
            wi = int(round(float(e[2]) * 100))
            adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0) + wi
            adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0) + wi
        else:  # unweighted: distinct edges vote 1 (duplicates ignored)
            adj.setdefault(u, {})[v] = 1
            adj.setdefault(v, {})[u] = 1
    lab = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v, nbrs in adj.items():
            counts: dict[str, int] = {}
            for u, wi in nbrs.items():
                counts[lab[u]] = counts.get(lab[u], 0) + wi
            # ties -> min label: (count desc, label asc)
            top = max(counts.values())
            best_lab = min(l for l, c in counts.items() if c == top)
            new[v] = best_lab
        lab = new
    return lab
