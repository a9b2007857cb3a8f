"""BPE subword tokenizer: train on a deterministic sample, apply
distributed.

The real-world 100 TB shape for tokenizer training (Sennrich et al.
2016, ACL — public paper): the merge table is learned from a bounded
corpus SAMPLE on the driver (same train-small/apply-big pattern as the
PQ codebooks in ``similarity.knn_pq``), broadcast once, and applied to
the full corpus by a stateful actor pool — the merge ranks dict and
the per-word memo cache are built once per actor in ``__init__``, not
per batch.  Tokenization output is reduced to a bounded subword
frequency table (per-batch combine before the one groupby), so nothing
corpus-sized moves.

Determinism: the sample is the md5-priority reservoir (partitioning-
independent), and merge training breaks pair-count ties
lexicographically — the learned merges are a pure function of
(corpus, seed, sample_k, n_merges).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from renard_ray.ops.textstats import _read_documents

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

__all__ = ["train_bpe_merges", "bpe_apply_wordcounts", "bpe_encode_word", "doc_bpe_vocab"]

_PRETOK_RE = re.compile(r"[a-z']+")
_EOW = "</w>"


def _word_syms(word: str) -> tuple:
    """Initial symbol sequence of a word: chars + end-of-word marker."""
    return tuple(word) + (_EOW,)


def train_bpe_merges(
    word_counts: "dict[str, int]", n_merges: int
) -> "list[tuple[str, str]]":
    """Classic BPE training over a word-frequency dict: repeatedly
    merge the most frequent adjacent symbol pair (ties broken
    lexicographically — deterministic).  Driver-side by design: the
    input is a SAMPLE's vocabulary, bounded regardless of corpus
    size."""
    vocab = {_word_syms(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return merges


def bpe_encode_word(
    word: str, ranks: "dict[tuple[str, str], int]"
) -> "tuple[str, ...]":
    """Encode one word with a trained merge-rank table: repeatedly
    apply the lowest-ranked applicable merge (the standard greedy BPE
    inference)."""
    syms = list(_word_syms(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


class _BpeCounter:
    """Actor-pool stage: merge ranks + per-word memo built ONCE per
    actor; each batch tokenizes its docs and emits a partial subword
    frequency table (bounded by the actor-local vocabulary)."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.memo: dict[str, tuple] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            for w in _PRETOK_RE.findall(t.lower()):
                toks = self.memo.get(w)
                if toks is None:
                    toks = bpe_encode_word(w, self.ranks)
                    self.memo[w] = toks
                for tok in toks:
                    counts[tok] = counts.get(tok, 0) + 1
        if not counts:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        items = sorted(counts.items())
        return pa.table(
            {
                "token": pa.array([k for k, _ in items], pa.string()),
                "n": pa.array([v for _, v in items], pa.int64()),
            }
        )


def bpe_apply_wordcounts(
    docs: Dataset,
    merges: "list[tuple[str, str]]",
    concurrency: int = 4,
) -> Dataset:
    """Distributed apply: subword frequency table of a document
    Dataset under a trained merge list.  One streaming pass (actor
    pool, state in ``__init__``), per-batch combine, ONE bounded
    groupby — the only all-to-all carries (token, n) rows."""
    merges_ref = ray.put(list(merges))
    partials = docs.map_batches(
        _BpeCounter,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return _hagg_auto(partials, "token", [('n', 'sum', 'n')])


def doc_bpe_vocab(
    sf_dir: str,
    n_merges: int = 200,
    sample_k: int = 200,
    k: int = 50,
    seed: int = 11,
) -> Dataset:
    """End-to-end tokenizer pipeline over the documents table: train
    BPE merges on a deterministic ``sample_k``-doc reservoir sample,
    apply them corpus-wide, return the top-``k`` subwords by frequency
    (count desc, token asc)."""
    from renard_ray.ops.sketches import reservoir_sample

    docs = _read_documents(sf_dir, ["doc_id", "text"])
    sample = reservoir_sample(docs, k=sample_k, seed=seed)
    wc: dict[str, int] = {}
    for row in sample:
        for w in _PRETOK_RE.findall((row.get("text") or "").lower()):
            wc[w] = wc.get(w, 0) + 1
    merges = train_bpe_merges(wc, n_merges)
    freq = bpe_apply_wordcounts(docs, merges)
    return freq.sort(["n", "token"], descending=[True, False]).limit(k)
