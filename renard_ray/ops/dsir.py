"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over the ``documents`` table.

Per-document importance log-weight

    logw(d) = sum_{f in feats(d)} [ ln p_target(b(f)) - ln p_raw(b(f)) ]

where features are lowercase word unigrams + bigrams hashed into
``n_buckets`` buckets (the paper's hashed n-gram feature space), and
the two bucket distributions are add-alpha-smoothed counts from the
TARGET split vs the RAW split of the corpus itself.  The target here
is the held-out 'val' side of the shared md5-priority split
(``textstats._is_train`` — one predicate, used everywhere), standing
in for the paper's high-quality target corpus; pass ``salt`` /
``threshold_hex`` through to select a different slice.

Resampling = feed ``exp(logw)`` to
``sketches.weighted_reservoir_sample`` — the two operators compose
into the paper's selection pipeline.

Scale shape:

- **count pass**: one tokenize pass emits per-batch-combined
  (bucket, is_target) partials; one ``groupby(bucket,
  is_target).sum`` whose output is <= 2 * n_buckets rows REGARDLESS
  of corpus size — the only all-to-all, with bounded width.
- **log-ratio vector**: length ``n_buckets`` (default 10k, the
  paper's size) built on the driver from exact int counts —
  deterministic — and broadcast once via ``ray.put``.
- **score pass**: batch-local hashing + ``np`` gathers; each doc's
  weight is a sequential sum over its own features in document
  order, so the result is independent of partitioning.

No counterpart in the reference; sibling of ``ops/lm.py``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from .textstats import _WS_RE, _is_train, _read_documents

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

_SEP = "\x1f"


def _feature_buckets(text: str | None, n_buckets: int) -> np.ndarray:
    """Hashed uni+bigram bucket ids for one document (md5-le-8 — ==
    DuckDB ``md5_number_upper`` so the SQL twin reproduces the bucket
    assignment exactly; stable across runs and processes — no
    PYTHONHASHSEED dependence)."""
    if not text or not text.strip():
        return np.empty(0, dtype=np.int64)
    ws = [w for w in _WS_RE.split(text.strip().lower()) if w]
    feats = ws + [ws[i] + _SEP + ws[i + 1] for i in range(len(ws) - 1)]
    return np.array(
        [
            struct.unpack("<Q", hashlib.md5(f.encode()).digest()[:8])[0]
            % n_buckets
            for f in feats
        ],
        dtype=np.int64,
    )


def dsir_log_ratio(
    docs: Dataset,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    threshold_hex: str = "f3",
    salt: str = "",
) -> np.ndarray:
    """Train the hashed-feature log-ratio vector
    ``ln p_target - ln p_raw`` (length ``n_buckets``)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        agg: dict[tuple[int, bool], int] = {}
        for d, t in zip(ids, texts):
            tgt = not _is_train(d, threshold_hex, salt)
            bs = _feature_buckets(t, n_buckets)
            for b in bs.tolist():
                k = (b, tgt)
                agg[k] = agg.get(k, 0) + 1
        ks = sorted(agg)
        return pa.table(
            {
                "bucket": pa.array([k[0] for k in ks], pa.int64()),
                "is_target": pa.array([k[1] for k in ks], pa.bool_()),
                "c": pa.array([agg[k] for k in ks], pa.int64()),
            }
        )

    counts = (
        _hagg_auto(docs.map_batches(partial, batch_format="pyarrow"), ["bucket", "is_target"], [('c', 'sum', 'c')])
    )
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    # bounded pull: <= 2 * n_buckets rows regardless of corpus size
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "bucket" not in b.column_names:
            continue
        bi = b.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        it = b.column("is_target").to_numpy(zero_copy_only=False).astype(bool)
        cc = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(tgt, bi[it], cc[it])
        np.add.at(raw, bi[~it], cc[~it])
    lam = np.log((tgt + alpha) / (tgt.sum() + alpha * n_buckets)) - np.log(
        (raw + alpha) / (raw.sum() + alpha * n_buckets)
    )
    return lam


def dsir_weights(
    sf_dir: str,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    threshold_hex: str = "f3",
    salt: str = "",
) -> Dataset:
    """(doc_id, split, n_feats, logweight) per document.

    ``logweight`` is the DSIR importance log-weight rounded to 6
    places; documents with no features score 0.0 with n_feats = 0
    (they carry no evidence either way)."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    lam = dsir_log_ratio(docs, n_buckets, alpha, threshold_hex, salt)
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        splits, nfs, lws = [], [], []
        for d, t in zip(ids, texts):
            splits.append("train" if _is_train(d, threshold_hex, salt) else "val")
            bs = _feature_buckets(t, n_buckets)
            nfs.append(len(bs))
            # sequential sum in document feature order: independent of
            # partitioning (each doc lives in exactly one batch)
            lws.append(round(float(lam_v[bs].sum()) if len(bs) else 0.0, 6))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(splits, pa.string()),
                "n_feats": pa.array(nfs, pa.int64()),
                "logweight": pa.array(lws, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
