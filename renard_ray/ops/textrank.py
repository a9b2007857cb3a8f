"""TextRank keyword extraction (Mihalcea & Tarau 2004 — public
reference): per-document PageRank over the word co-occurrence graph
of a sliding window, top-k words per document.

The 100 TB shape is the easy one: the graph is PER DOCUMENT (a few
hundred nodes), so the whole operator is ONE stateless ``map_batches``
pass — embarrassingly parallel, no shuffle, no driver state.  Inside
a batch each document runs a dense numpy power iteration (vocabulary
capped with a logged counter; a dense cap² matrix at the default cap
of 512 is 2 MB — batch-local, never materialized across docs).

Determinism: EXACT FIXED-POINT arithmetic (round 5) — ranks iterate in
integer 1e-12 units with floor divisions ((W*p)//out per edge,
(17*s)//20 for the 0.85 damping, 3S//(20n) for the teleport), so the
per-document result is a pure integer function of the text,
independent of platform/BLAS, and re-derives term for term in SQL
(the ``doc_textrank_keywords`` DuckDB twin unrolls the 30 rounds).
The deviation from float TextRank is bounded by ~n*iters/1e12 (< 1e-7
at the 512-word cap).  Ties in the final top-k break on (score desc,
word asc).
"""

from __future__ import annotations

import logging
import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["textrank_keywords", "textrank_keywords_replica"]

_TOKEN_RE = re.compile(r"[a-z][a-z']{2,}")  # words of >= 3 letters
_LOG = logging.getLogger(__name__)


def _doc_keywords(
    text: str | None,
    topk: int,
    window: int,
    iters: int,
    damping: float,
    max_vocab: int,
) -> tuple[list[str], list[float], bool]:
    """(words, scores, truncated) for one document — shared by the
    distributed pass and the test replica."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return [], [], False
    vocab: dict[str, int] = {}
    for t in toks:
        if t not in vocab:
            vocab[t] = len(vocab)
    truncated = len(vocab) > max_vocab
    if truncated:
        keep = set(list(vocab)[:max_vocab])
        toks = [t for t in toks if t in keep]
        vocab = {}
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    n = len(vocab)
    ids = np.array([vocab[t] for t in toks], dtype=np.int64)
    # damping is fixed at 17/20 by the integer recipe below
    assert damping == 0.85, "fixed-point textrank implements d = 17/20"
    assert len(ids) < 5_000_000, "textrank: W*p would leave int64 range"
    W = np.zeros((n, n), dtype=np.int64)
    for off in range(1, window + 1):
        if off >= len(ids):
            break
        a, b = ids[:-off], ids[off:]
        np.add.at(W, (a, b), 1)
        np.add.at(W, (b, a), 1)
    np.fill_diagonal(W, 0)
    out = W.sum(axis=1)  # symmetric: row sums == column sums
    denom = np.maximum(out, 1)[None, :]
    S = 10**12
    p = np.full(n, S // n, dtype=np.int64)
    base = (3 * S) // (20 * n)
    for _ in range(iters):
        s = ((W * p[None, :]) // denom).sum(axis=1)
        p = base + (17 * s) // 20
    words = list(vocab)
    order = sorted(range(n), key=lambda i: (-p[i], words[i]))[:topk]
    return (
        [words[i] for i in order],
        [p[i] / S for i in order],
        truncated,
    )


def textrank_keywords_replica(
    text: str | None,
    topk: int = 5,
    window: int = 4,
    iters: int = 30,
    damping: float = 0.85,
    max_vocab: int = 512,
) -> list[tuple[str, float]]:
    w, s, _t = _doc_keywords(text, topk, window, iters, damping, max_vocab)
    return list(zip(w, [round(x, 8) for x in s]))


def textrank_keywords(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 5,
    window: int = 4,
    iters: int = 30,
    damping: float = 0.85,
    max_vocab: int = 512,
) -> Dataset:
    """Top-``topk`` TextRank keywords per document:
    (doc_id, rank, keyword, score).  One stateless batch pass."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_rank, out_kw, out_sc = [], [], [], []
        n_trunc = 0
        for did, text in zip(ids, texts):
            words, scores, truncated = _doc_keywords(
                text, topk, window, iters, damping, max_vocab
            )
            n_trunc += int(truncated)
            for r, (w, s) in enumerate(zip(words, scores)):
                out_id.append(did)
                out_rank.append(r + 1)
                out_kw.append(w)
                out_sc.append(round(s, 8))
        if n_trunc:
            _LOG.warning(
                "textrank_keywords: %d documents exceeded max_vocab=%d "
                "— their graphs were truncated to the first %d distinct "
                "words", n_trunc, max_vocab, max_vocab,
            )
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                "doc_id": pa.array(out_id, id_type),
                "rank": pa.array(out_rank, pa.int64()),
                "keyword": pa.array(out_kw, pa.string()),
                "score": pa.array(out_sc, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow"
    )
