"""Skip-gram-with-negative-sampling node embeddings over the random-
walk corpus — the training half of DeepWalk/node2vec (Perozzi et al.
2014; Mikolov et al. 2013 SGNS — public references).

Split of labor (the repo's train-small/apply-big recipe, same as BPE
merges / PQ codebooks / the quality classifier):

- the WALK CORPUS is the distributed artifact (``ops/walks`` — per
  step one join + one groupby-argmin, deterministic);
- the corpus is VOCABULARY-BOUNDED: |V| x walks_per_node x walk_len
  rows regardless of input size, so it is a legitimate driver pull
  (the same argument as the canonicalization broadcast); a
  deterministic md5 walk-subset cap guards the pathological case and
  logs what it dropped;
- SGNS training runs driver-side in numpy: init, pair order and
  negative draws all come from ONE seeded RandomState over the
  SORTED vocabulary — the embedding table is a PURE FUNCTION of
  (corpus, hyperparameters, seed), hence reproducible under retries
  and partitioning (note: per-node init depends on the node's sorted
  position, so growing the corpus re-draws everyone's init — train
  runs are comparable only at fixed corpus+seed);
- the output is a (node, e0..e{dim-1}) Dataset — unit-normalized
  rows ready for the ANN operators (knn_bruteforce & friends).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

__all__ = ["sgns_node_embeddings"]

_LOG = logging.getLogger(__name__)


def sgns_node_embeddings(
    walks: Dataset,
    dim: int = 16,
    window: int = 2,
    epochs: int = 5,
    lr: float = 0.05,
    neg: int = 5,
    seed: int = 7,
    max_corpus_rows: int = 2_000_000,
) -> Dataset:
    """Train SGNS embeddings on a (src, walk, step, node) walk corpus;
    returns a sorted (node, e0..e{dim-1}) Dataset of unit vectors."""
    rows = walks.select_columns(["src", "walk", "step", "node"]).materialize()
    n_rows = rows.count()
    if n_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()),
                 **{f"e{j}": pa.array([], pa.float64()) for j in range(dim)}}
            )
        )
    if n_rows > max_corpus_rows:
        # deterministic walk-subset cap: keep walks whose md5 falls
        # under the keep ratio — a pure function of (src, walk, seed)
        keep_ratio = max_corpus_rows / n_rows
        thresh = int(keep_ratio * 2**32)
        _LOG.warning(
            "sgns_node_embeddings: corpus has %d rows > cap %d — "
            "keeping a deterministic ~%.1f%% walk subset",
            n_rows, max_corpus_rows, keep_ratio * 100,
        )
        import pyarrow.compute as pc

        def keep(batch: pa.Table) -> pa.Table:
            import struct as _struct

            srcs = batch.column("src").to_pylist()
            wks = batch.column("walk").to_pylist()
            mask = [
                _struct.unpack(
                    "<I",
                    hashlib.md5(f"{seed}:{s}:{w}".encode()).digest()[:4],
                )[0]
                < thresh
                for s, w in zip(srcs, wks)
            ]
            return batch.filter(pa.array(mask))

        rows = rows.map_batches(keep, batch_format="pyarrow")

    # bounded driver pull, ordered into sequences
    tab = pa.concat_tables(
        [t for t in ray.get(rows.materialize().to_arrow_refs()) if t.num_rows]
    )
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tab,
        sort_keys=[("src", "ascending"), ("walk", "ascending"),
                   ("step", "ascending")],
    )
    tab = tab.take(idx)
    srcs = tab.column("src").to_pylist()
    wks = tab.column("walk").to_pylist()
    nodes_seq = tab.column("node").to_pylist()

    vocab: dict[str, int] = {}
    for n in sorted(set(nodes_seq)):
        vocab[n] = len(vocab)
    nv = len(vocab)

    # skip-gram pairs within the window, per walk
    pairs: list[tuple[int, int]] = []
    counts = np.zeros(nv, dtype=np.int64)
    i = 0
    while i < len(nodes_seq):
        j = i
        while (
            j < len(nodes_seq) and srcs[j] == srcs[i] and wks[j] == wks[i]
        ):
            j += 1
        seq = [vocab[n] for n in nodes_seq[i:j]]
        for a in range(len(seq)):
            counts[seq[a]] += 1
            for off in range(1, window + 1):
                if a + off < len(seq):
                    pairs.append((seq[a], seq[a + off]))
                    pairs.append((seq[a + off], seq[a]))
        i = j
    if not pairs:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array(sorted(vocab), pa.string()),
                 **{f"e{j}": pa.array([0.0] * nv, pa.float64())
                    for j in range(dim)}}
            )
        )

    # one seeded RandomState drives init, pair order and negatives:
    # pure function of (sorted vocab, seed)
    rng = np.random.RandomState(seed)
    w_in = (rng.rand(nv, dim) - 0.5) / dim
    w_out = np.zeros((nv, dim), dtype=np.float64)
    # unigram^0.75 negative table (standard word2vec smoothing)
    p = counts.astype(np.float64) ** 0.75
    p /= p.sum()

    pair_arr = np.array(pairs, dtype=np.int64)
    for _ep in range(epochs):
        order = rng.permutation(len(pair_arr))
        negs = rng.choice(nv, size=(len(pair_arr), neg), p=p)
        for k in order:
            c, t = pair_arr[k]
            targets = np.concatenate(([t], negs[k]))
            labels = np.zeros(len(targets))
            labels[0] = 1.0
            v = w_in[c]
            u = w_out[targets]
            z = 1.0 / (1.0 + np.exp(-np.clip(u @ v, -30, 30)))
            g = (z - labels) * lr
            w_in[c] -= g @ u
            w_out[targets] -= np.outer(g, v)

    norms = np.linalg.norm(w_in, axis=1)
    w = w_in / np.maximum(norms, 1e-12)[:, None]
    names = sorted(vocab, key=vocab.get)
    order = np.argsort(names)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([names[i] for i in order], pa.string()),
                **{
                    f"e{j}": pa.array(
                        np.round(w[order, j], 8), pa.float64()
                    )
                    for j in range(dim)
                },
            }
        )
    )
