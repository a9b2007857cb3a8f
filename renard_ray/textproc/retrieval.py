"""NER context retrieval (per-document sentence retrieval).

Capability parity with the reference's retriever family
(``renard/pipeline/ner/retrieval.py:31-375``), which augments each
sentence with retrieved context sentences before neural NER:

- ``samenoun_context``  — sentences sharing a common noun, random k
  (``retrieval.py:77-111``; seeded here for determinism under retries,
  SURVEY §7.4).
- ``neighbors_context`` — ±k/2 surrounding sentences
  (``retrieval.py:114-137``).
- ``bm25_context``      — BM25 top-k (``retrieval.py:140-163``); BM25
  is the public Robertson/Sparck-Jones formula, implemented from
  scratch.
- ``ensemble_context``  — union of several retrievers
  (``retrieval.py:345-375``).
- ``NeuralContextReranker`` — the neural reranker slot
  (``retrieval.py:213-342``): heuristic pre-match + pair-scorer
  rerank; scorer loads once per instance (actor ``__init__``), with a
  deterministic lexical proxy standing in for the model-gated BERT
  head in this sandbox.

All are per-document (the index is doc-local state, built inside the
NER actor call — SURVEY §2.3), returning for each sentence the list of
retrieved sentence indices.  The neural-NER actor consumes these to
build augmented inputs; the rule NER ignores them.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from renard_ray.resources.lexicons import STOPWORDS


def _content_words(sentence: list[str]) -> set[str]:
    return {
        t.lower()
        for t in sentence
        if t.isalpha() and len(t) > 2 and t.lower() not in STOPWORDS
    }


def samenoun_context(
    sentences: list[list[str]], k: int = 3, seed: int = 0
) -> list[list[int]]:
    """For each sentence, up to k random other sentences sharing at
    least one content word (deterministic via per-doc seed)."""
    words = [_content_words(s) for s in sentences]
    out: list[list[int]] = []
    for i in range(len(sentences)):
        cands = [
            j for j in range(len(sentences)) if j != i and words[i] & words[j]
        ]
        rng = random.Random((seed << 16) ^ i)
        if len(cands) > k:
            cands = rng.sample(cands, k)
        out.append(sorted(cands))
    return out


def neighbors_context(sentences: list[list[str]], k: int = 2) -> list[list[int]]:
    """±k/2 neighboring sentences (reference ``retrieval.py:114-137``)."""
    half = max(1, k // 2)
    out = []
    n = len(sentences)
    for i in range(n):
        out.append(
            [j for j in range(max(0, i - half), min(n, i + half + 1)) if j != i]
        )
    return out


class BM25Index:
    """Doc-local BM25 over sentences (k1/b defaults per the literature)."""

    def __init__(self, sentences: list[list[str]], k1: float = 1.5, b: float = 0.75):
        self.k1, self.b = k1, b
        self.docs = [[t.lower() for t in s] for s in sentences]
        self.doc_freqs = [Counter(d) for d in self.docs]
        self.doc_lens = [len(d) for d in self.docs]
        self.avgdl = (sum(self.doc_lens) / len(self.docs)) if self.docs else 0.0
        df: Counter = Counter()
        for d in self.docs:
            df.update(set(d))
        n = len(self.docs)
        self.idf = {
            t: math.log((n - f + 0.5) / (f + 0.5) + 1.0) for t, f in df.items()
        }

    def score(self, query: list[str], j: int) -> float:
        freqs = self.doc_freqs[j]
        dl = self.doc_lens[j] or 1
        s = 0.0
        for t in query:
            t = t.lower()
            f = freqs.get(t)
            if not f:
                continue
            idf = self.idf.get(t, 0.0)
            s += idf * (f * (self.k1 + 1)) / (
                f + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
            )
        return s

    def topk(self, query: list[str], k: int, exclude: int | None = None) -> list[int]:
        scored = [
            (self.score(query, j), -j)
            for j in range(len(self.docs))
            if j != exclude
        ]
        scored.sort(reverse=True)
        return sorted(-nj for s, nj in scored[:k] if s > 0.0)


def bm25_context(sentences: list[list[str]], k: int = 3) -> list[list[int]]:
    idx = BM25Index(sentences)
    return [
        idx.topk(sentences[i], k, exclude=i) for i in range(len(sentences))
    ]


def ensemble_context(
    sentences: list[list[str]],
    retrievers: list[str] = ("neighbors", "bm25"),
    k: int = 3,
    seed: int = 0,
) -> list[list[int]]:
    """Union of several retrievers' contexts (``retrieval.py:345-375``)."""
    fns = {
        "samenoun": lambda: samenoun_context(sentences, k, seed),
        "neighbors": lambda: neighbors_context(sentences, k),
        "bm25": lambda: bm25_context(sentences, k),
        "neural": lambda: NeuralContextReranker(k=k).rerank_all(sentences),
    }
    acc: list[set[int]] = [set() for _ in sentences]
    for name in retrievers:
        for i, ctx in enumerate(fns[name]()):
            acc[i].update(ctx)
    return [sorted(s) for s in acc]


class NeuralContextReranker:
    """Neural reranker over heuristic context matches (reference
    ``NERNeuralContextRetriever``, ``renard/pipeline/ner/retrieval.py:213-342``,
    Amalvy et al. 2024): a heuristic retriever proposes candidate
    context sentences, a sequence-classification model scores each
    (sentence, candidate) pair, and the top-k above ``threshold``
    survive.

    Deployment shape: the SCORER loads once per instance — this class
    is the actor slot (construct in an actor's ``__init__``, call per
    batch).  The real BERT reranker is model-gated in this sandbox, so
    the default scorer is a deterministic lexical-overlap proxy with
    the same interface; pass ``scorer=`` (a callable
    ``(query_tokens, ctx_tokens) -> float in [0, 1]``) to plug the
    model head in.
    """

    def __init__(
        self,
        heuristic: str = "bm25",
        k: int = 3,
        heuristic_k: int = 8,
        threshold: float = 0.0,
        scorer=None,
        seed: int = 0,
    ):
        self.heuristic = heuristic
        self.k = k
        self.heuristic_k = max(heuristic_k, k)
        self.threshold = threshold
        self.seed = seed
        # model load happens HERE (once per actor); the sandbox default
        # is the deterministic proxy below
        self.scorer = scorer or self._overlap_scorer

    @staticmethod
    def _overlap_scorer(query: list[str], ctx: list[str]) -> float:
        """Deterministic stand-in for the BERT pair classifier: content
        -word Jaccard, squashed to (0, 1)."""
        q, c = _content_words(query), _content_words(ctx)
        if not q or not c:
            return 0.0
        return len(q & c) / len(q | c)

    def _heuristic_matches(self, sentences: list[list[str]]) -> list[list[int]]:
        if self.heuristic == "bm25":
            return bm25_context(sentences, self.heuristic_k)
        if self.heuristic == "samenoun":
            return samenoun_context(sentences, self.heuristic_k, self.seed)
        if self.heuristic == "neighbors":
            return neighbors_context(sentences, self.heuristic_k)
        raise ValueError(f"unknown heuristic {self.heuristic!r}")

    def rerank(
        self, i: int, sentences: list[list[str]], matches: list[int]
    ) -> list[int]:
        """Reference ``retrieve()``: score each heuristic match, keep
        top-k above threshold (score desc, index asc tie-break)."""
        scored = [(self.scorer(sentences[i], sentences[j]), -j) for j in matches]
        scored.sort(reverse=True)
        return [-nj for s, nj in scored[: self.k] if s > self.threshold]

    def rerank_all(self, sentences: list[list[str]]) -> list[list[int]]:
        matches = self._heuristic_matches(sentences)
        return [
            sorted(self.rerank(i, sentences, matches[i]))
            for i in range(len(sentences))
        ]
