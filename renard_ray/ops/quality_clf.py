"""fastText-style linear quality classifier: train-on-sample,
apply-distributed (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification"; the web-pipeline usage — train a tiny linear
model against a reference corpus and score every page — follows
CCNet (Wenzek et al. 2020) and the GPT-3/LLaMA data notes.  All
public references.)

The 100 TB shape is the BPE/PQ/DSIR recipe already used elsewhere in
this repo: the model is tiny (hashed-n-gram weight vector), so
training runs driver-side on the deterministic md5-priority reservoir
sample, and the corpus-wide APPLY is the distributed part — a
stateful actor pool whose weight vector is fetched from the object
store once per actor in ``__init__``, scoring each batch with numpy
(one fancy-index + segment-mean per batch; the only per-document
Python is the md5-le-8 feature hashing shared with DSIR —
``ops/dsir.py`` ``_feature_buckets``).

Determinism: the sample is a pure function of (corpus, seed); training
is full-batch gradient descent from zero init in float64 (no
stochasticity); scoring is per-document arithmetic — independent of
partitioning and retries by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from renard_ray.ops.dsir import _feature_buckets

__all__ = [
    "train_quality_classifier",
    "score_quality",
    "score_quality_replica",
]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


def train_quality_classifier(
    ds: Dataset,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 32_768,
    sample_n: int = 2_000,
    seed: int = 7,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> dict:
    """Train the linear classifier on a deterministic reservoir sample
    of ``ds`` (rows with ``label_col`` in {0, 1}).  Returns the model
    as a plain dict: {"w": float64[n_buckets], "b": float,
    "n_buckets": int} — small enough to broadcast.

    Full-batch logistic regression with L2, zero init, fixed ``iters``
    — a pure function of the sample, hence of (corpus, seed)."""
    import pyarrow.compute as pc

    from renard_ray.ops.sketches import reservoir_sample

    def binary_only(batch: pa.Table) -> pa.Table:
        lab = batch.column(label_col)
        return batch.filter(
            pc.and_(
                pc.is_valid(lab),
                pc.is_in(
                    pc.cast(lab, pa.int64()),
                    value_set=pa.array([0, 1], pa.int64()),
                ),
            )
        )

    rows = reservoir_sample(
        ds.select_columns([text_col, label_col]).map_batches(
            binary_only, batch_format="pyarrow"
        ),
        k=sample_n, seed=seed,
    )
    if not rows:
        raise ValueError("train_quality_classifier: empty sample")
    docs, flat, ptr = [], [], [0]
    y = []
    for r in rows:
        bs = _feature_buckets(r.get(text_col), n_buckets)
        docs.append(bs)
        flat.extend(bs.tolist())
        ptr.append(len(flat))
        y.append(float(r[label_col]))
    yv = np.array(y, dtype=np.float64)
    flatv = np.array(flat, dtype=np.int64)
    ptrv = np.array(ptr, dtype=np.int64)
    lens = np.maximum(np.diff(ptrv), 1).astype(np.float64)
    doc_of = np.repeat(np.arange(len(rows)), np.diff(ptrv))

    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    n = float(len(rows))
    for _ in range(iters):
        # mean-bucket features: score_i = mean(w[buckets_i]) + b
        sums = np.zeros(len(rows), dtype=np.float64)
        np.add.at(sums, doc_of, w[flatv])
        p = _sigmoid(sums / lens + b)
        g = (p - yv) / n
        gw = np.zeros(n_buckets, dtype=np.float64)
        np.add.at(gw, flatv, g[doc_of] / lens[doc_of])
        w -= lr * (gw + l2 * w)
        b -= lr * float(g.sum())
    return {"w": w, "b": b, "n_buckets": n_buckets}


def score_quality_replica(text: str | None, model: dict) -> float:
    """Single-document python replica of the distributed scorer (used
    by tests and the training loop's definition of the feature map)."""
    bs = _feature_buckets(text, model["n_buckets"])
    z = model["b"] + (float(model["w"][bs].mean()) if len(bs) else 0.0)
    return float(_sigmoid(np.array([z]))[0])


class _QualityScorer:
    """Actor-pool scorer: weights fetched from the object store ONCE
    per actor; per batch one fancy-index + segment-mean."""

    def __init__(self, model_ref, text_col: str, keep_cols: tuple):
        self.model = ray.get(model_ref)
        self.w = self.model["w"]
        self.b = self.model["b"]
        self.n_buckets = self.model["n_buckets"]
        self.text_col = text_col
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        flat, counts = [], np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            bs = _feature_buckets(t, self.n_buckets)
            counts[i] = len(bs)
            flat.extend(bs.tolist())
        sums = np.zeros(len(texts), dtype=np.float64)
        if flat:
            doc_of = np.repeat(np.arange(len(texts)), counts)
            np.add.at(sums, doc_of, self.w[np.array(flat, dtype=np.int64)])
        z = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0) + self.b
        out = {c: batch.column(c) for c in self.keep_cols}
        out["q_score"] = pa.array(np.round(_sigmoid(z), 6), pa.float64())
        return pa.table(out)


def score_quality(
    ds: Dataset,
    model: dict,
    text_col: str = "text",
    keep_cols: tuple = ("doc_id",),
    concurrency: int = 4,
    batch_size: int = 256,
) -> Dataset:
    """Score every row of ``ds`` with a trained model: appends
    ``q_score`` (sigmoid, rounded 6) to ``keep_cols``.  The text
    column never leaves the scoring stage."""
    model_ref = ray.put(
        {
            "w": np.asarray(model["w"], dtype=np.float64),
            "b": float(model["b"]),
            "n_buckets": int(model["n_buckets"]),
        }
    )
    return ds.select_columns(list(dict.fromkeys([*keep_cols, text_col]))).map_batches(
        _QualityScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "text_col": text_col,
            "keep_cols": tuple(keep_cols),
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        # (1, N) autoscaling pool: a fixed pool of N can reserve every
        # CPU of a small session and starve the upstream read
        concurrency=(1, concurrency),
    )
