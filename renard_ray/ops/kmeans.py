"""Distributed k-means over the ``embeddings`` table and SemDeDup-style
semantic deduplication built on it.

Lloyd's iteration re-expressed Ray-Data-first:

- **init**: the k rows with the smallest ids — a per-batch partial
  top-k (each batch keeps its k smallest ids) merged on the driver, so
  init is deterministic and never shuffles or sorts the table;
- **assign + partial sums**: centroids broadcast once per iteration
  via ``ray.put`` (k x d, tiny); one ``map_batches`` pass computes the
  argmin-L2 assignment and emits k partial rows per batch
  (cluster, count, vector sum);
- **reduce**: the per-batch partials are combined tree-style (a
  ``repartition`` + per-block combine pass) before a bounded driver
  merge of at most ``combine_parts * k`` rows — nothing data-sized
  ever lands on the driver;
- **update**: new centroid = partial-sum / count; empty clusters keep
  their previous centroid.  Fixed ``n_iter`` keeps runs deterministic.

``semantic_dedup_pairs`` is the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): cluster on normalized vectors (spherical k-means),
then inside each cluster greedily keep the lowest id and drop any
member whose cosine to an already-kept member is >= the threshold.
Pairwise work is cluster-local — O(sum m_c^2) instead of O(n^2) — and
each cluster is processed in one ``map_groups`` task with chunked
numpy matmuls, so memory stays bounded even for hot clusters.  An
explicit per-cluster row cap drops (and logs) pathological clusters
instead of silently stalling, mirroring the minhash/simhash bucket
policy in ``ops.dedup``.

No counterpart in the reference (no embedding ops at all); sibling of
``ops/similarity.py`` / ``ops/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .similarity import _matrix, _read_embeddings  # shared decode/read

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

_COMBINE_PARTS = 16  # partial-sum tree fan-in before the driver merge


def _batch_matrix(batch: pa.Table, vec_col: str, normalize: bool) -> np.ndarray:
    """(n, d) float64 matrix via the shared zero-copy decode (null-safe
    fallback included); optional L2 row normalization."""
    X = _matrix(batch.column(vec_col))
    if normalize:
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def _seed_centroids(
    embs: Dataset, k: int, id_col: str, vec_col: str, normalize: bool
) -> np.ndarray:
    """Deterministic init: vectors of the k smallest ids.  Per-batch
    partial top-k (k rows each) then a driver merge of the partials —
    no global sort."""

    def smallest(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.array_sort_indices(batch.column(id_col))[:k]
        return batch.select([id_col, vec_col]).take(idx)

    rows = embs.map_batches(smallest, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    C = np.asarray([r[vec_col] for r in rows[:k]], dtype=np.float64)
    if normalize:
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _assign(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, squared L2 distance) per row; ties -> lowest index."""
    d2 = (
        (X * X).sum(axis=1, keepdims=True)
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(X)), a], 0.0)


def kmeans_fit(
    embs: Dataset,
    k: int = 8,
    n_iter: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    combine_parts: int = _COMBINE_PARTS,
) -> np.ndarray:
    """Fit k centroids with Lloyd's iteration; returns the (k, d)
    centroid matrix.  ``normalize=True`` L2-normalizes rows first
    (spherical k-means — argmin L2 == argmax cosine)."""
    # one object-store materialization instead of n_iter re-reads of
    # the source — the standard iterative-ML trade (blocks spill when
    # the table outgrows memory, each iteration streams them back)
    embs = embs.materialize()
    C = _seed_centroids(embs, k, id_col, vec_col, normalize)
    k = len(C)  # fewer rows than k: degenerate but well-defined
    d = C.shape[1]

    for _ in range(n_iter):
        ref = ray.put(C)

        empty = pa.table(
            {
                "cluster": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "vsum": pa.array([], pa.list_(pa.float64())),
            }
        )

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            X = _batch_matrix(batch, vec_col, normalize)
            Cb = ray.get(ref)
            a, _ = _assign(X, Cb)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnt),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        def combine(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            cl = np.asarray(batch.column("cluster"))
            cnt = np.asarray(batch.column("cnt"))
            S = np.asarray(batch.column("vsum").to_pylist(), dtype=np.float64)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, cl, S)
            tot = np.zeros(k, dtype=np.int64)
            np.add.at(tot, cl, cnt)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(tot),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        partials = embs.map_batches(partial, batch_format="pyarrow")
        # tree-combine only pays when there are many partial blocks —
        # below that the repartition stage is pure per-iteration
        # overhead and the driver merge is already tiny
        if embs.num_blocks() > combine_parts * 4:
            partials = partials.repartition(combine_parts).map_batches(
                combine, batch_format="pyarrow", batch_size=None
            )
        sums = np.zeros((k, d), dtype=np.float64)
        tot = np.zeros(k, dtype=np.int64)
        for b in partials.iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            cl = np.asarray(b.column("cluster"))
            np.add.at(sums, cl, np.asarray(b.column("vsum").to_pylist(), dtype=np.float64))
            np.add.at(tot, cl, np.asarray(b.column("cnt")))
        nz = tot > 0
        C = C.copy()
        C[nz] = sums[nz] / tot[nz, None]
        if normalize:
            C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def kmeans_assign(
    embs: Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> Dataset:
    """(id, cluster, dist) — dist is the L2 distance to the assigned
    centroid (on normalized vectors when ``normalize``), rounded to 6
    digits."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        X = _batch_matrix(batch, vec_col, normalize)
        a, d2 = _assign(X, ray.get(ref))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(np.round(np.sqrt(d2), 6)),
            }
        )

    return embs.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_stats(
    sf_dir: str, k: int = 8, n_iter: int = 10
) -> Dataset:
    """Query surface: per-cluster (cluster, n_vecs, avg_dist) over the
    ``embeddings`` table, sorted by cluster id."""
    embs = _read_embeddings(sf_dir).materialize()
    C = kmeans_fit(embs, k, n_iter)
    assigned = kmeans_assign(embs, C)

    def stats(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["cluster"]).aggregate(
            [("cluster", "count"), ("dist", "sum")]
        )
        return t.rename_columns(["cluster", "n_vecs", "dist_sum"])

    from ray.data.aggregate import Sum

    return (
        _hagg_auto(assigned.map_batches(stats, batch_format="pyarrow"), "cluster", [('n_vecs', 'sum', 'n_vecs'), ('dist_sum', 'sum', 'dist_sum')])
        .map_batches(
            lambda b: pa.table(
                {
                    "cluster": b.column("cluster"),
                    "n_vecs": b.column("n_vecs"),
                    "avg_dist": pa.array(
                        np.round(
                            np.asarray(b.column("dist_sum"))
                            / np.maximum(np.asarray(b.column("n_vecs")), 1),
                            4,
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("cluster")
    )


def semantic_dedup_pairs(
    sf_dir: str,
    threshold: float = 0.45,
    k: int = 8,
    n_iter: int = 10,
    *,
    cluster_cap: int = 100_000,
) -> Dataset:
    """SemDeDup: spherical k-means then greedy within-cluster dedup.
    Returns the dropped pairs (vec_id, dup_of, cosine_sim) — ``dup_of``
    is the kept (lowest-id) member the vector matched, sorted by
    vec_id.  Every returned pair is a true global near-dup (cosine is
    computed on the real vectors), so the answer is a subset of the
    exact O(n^2) pair join restricted to co-clustered vectors.

    Scale sizing (``k`` x ``cluster_cap``): the per-cluster greedy IS
    the published SemDeDup algorithm (O(m^2) within a cluster), so a
    cluster's rows must fit one task — ``cluster_cap`` bounds that
    loudly (warn + keep lowest ids) rather than OOMing.  The k=8
    default is fixture-sized; at corpus scale size ``k`` so the MEAN
    cluster is well under the cap, i.e. k ≈ n / (cluster_cap / a few)
    — e.g. 1e9 vectors at cap 100k wants k ≈ 20k-50k, matching the
    paper's 'many small clusters' regime.  The map_groups here stays
    deliberately: within-cluster order-dependent greedy is inherently
    sequential per group; parallelism comes from #clusters."""
    embs = _read_embeddings(sf_dir).materialize()
    C = kmeans_fit(embs, k, n_iter)
    ref = ray.put(np.asarray(C, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        X = _batch_matrix(batch, "embedding", True)
        a, _ = _assign(X, ray.get(ref))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
                "vec": pa.array(list(X), pa.list_(pa.float64())),
            }
        )

    tagged = embs.map_batches(tag, batch_format="pyarrow")

    def dedup_cluster(group):
        m = len(group)
        if m > cluster_cap:
            import logging

            logging.getLogger(__name__).warning(
                "semantic_dedup: cluster of %d rows exceeds cap %d; "
                "keeping the %d lowest ids only",
                m, cluster_cap, cluster_cap,
            )
            group = group.nsmallest(cluster_cap, "vec_id")
            m = len(group)
        g = group.sort_values("vec_id").reset_index(drop=True)
        X = np.asarray(g["vec"].tolist(), dtype=np.float64)
        ids = g["vec_id"].to_numpy()
        kept: list[int] = []
        out_id, out_of, out_sim = [], [], []
        for i in range(m):
            if kept:
                sims = X[kept] @ X[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    out_id.append(int(ids[i]))
                    out_of.append(int(ids[kept[j]]))
                    out_sim.append(round(float(sims[j]), 4))
                    continue
            kept.append(i)
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "dup_of": pa.array(out_of, pa.int64()),
                "cosine_sim": pa.array(out_sim, pa.float64()),
            }
        )

    return (
        tagged.groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
        .sort("vec_id")
    )
