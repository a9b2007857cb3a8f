"""Sliding-window document chunking: split each document's
whitespace-token stream into fixed-size overlapping windows — the
standard preprocessing for RAG indexing and long-context training
(window + stride, cf. the original BERT/GPT-2 data pipelines; public
technique).

Scale shape: ONE stateless ``map_batches`` pass (a per-doc flat-map —
no shuffle, no driver state); chunks multiply rows by roughly
``n_tokens / (chunk - overlap)`` so the operator is output-bound, and
the streaming executor's backpressure handles the fan-out.

Tokenization is plain ``str.split()`` (whitespace runs, empties
dropped) and the chunk text is the ``' '``-joined token slice — both
chosen to be byte-reproducible in ANSI SQL (DuckDB
``string_split_regex`` + list slicing), so the operator carries a
full value-hash oracle, not a rows-only check.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

__all__ = ["chunk_documents"]


def chunk_documents(
    ds: Dataset,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, chunk_idx, n_tokens, chunk_text) for every window of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared
    between consecutive windows.  The final window may be shorter;
    empty documents emit no rows.  Deterministic and partitioning-
    independent (pure per-document function)."""
    assert 0 <= overlap < chunk_tokens, "need 0 <= overlap < chunk_tokens"
    step = chunk_tokens - overlap

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_idx, out_n, out_text = [], [], [], []
        for did, text in zip(ids, texts):
            toks = (text or "").split()
            n = len(toks)
            if n == 0:
                continue
            idx = 0
            for start in range(0, n, step):
                window = toks[start : start + chunk_tokens]
                out_id.append(did)
                out_idx.append(idx)
                out_n.append(len(window))
                out_text.append(" ".join(window))
                idx += 1
                if start + chunk_tokens >= n:
                    break  # this window already covered the tail
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                "doc_id": pa.array(out_id, id_type),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow"
    )
