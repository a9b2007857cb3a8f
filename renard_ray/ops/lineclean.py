"""C4-style LINE-level boilerplate cleaning (Raffel et al. 2020 §2.2
— public reference): the stage BEFORE document-level filtering — drop
navigation/cookie/JS/short lines, keep prose, re-join the survivors.

One stateless ``map_batches`` pass (per-doc flat work, no shuffle, no
driver state).  Every predicate is chosen byte-reproducible in ANSI
SQL (string_split on newline + trim + word count via the same
regex-split as the chunker + LIKE/contains), so the query carries a
full DuckDB value-hash oracle.

Rules (C4's published line rules, each toggleable):
- at least ``min_words`` whitespace words;
- ends in terminal punctuation (``.!?"``) when
  ``require_terminal_punct``;
- none of the ``banned`` substrings, case-insensitively
  (C4 uses javascript / lorem ipsum / cookie / '{').
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

__all__ = ["clean_lines"]

_DEFAULT_BANNED = ("javascript", "lorem ipsum", "cookie", "{")
_TERMINAL = ('.', '!', '?', '"')


def clean_lines(
    ds: Dataset,
    min_words: int = 5,
    require_terminal_punct: bool = True,
    banned: tuple = _DEFAULT_BANNED,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, n_lines, n_kept, clean_text) per document with at
    least one surviving line; lines are trimmed, survivors re-joined
    with a newline.  ``n_lines`` counts non-empty trimmed lines."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_nl, out_nk, out_text = [], [], [], []
        for did, text in zip(ids, texts):
            lines = [ln.strip() for ln in (text or "").split("\n")]
            nonempty = [ln for ln in lines if ln]
            kept = []
            for ln in nonempty:
                if len(ln.split()) < min_words:
                    continue
                if require_terminal_punct and not ln.endswith(_TERMINAL):
                    continue
                low = ln.lower()
                if any(b in low for b in banned):
                    continue
                kept.append(ln)
            if kept:
                out_id.append(did)
                out_nl.append(len(nonempty))
                out_nk.append(len(kept))
                out_text.append("\n".join(kept))
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                "doc_id": pa.array(out_id, id_type),
                "n_lines": pa.array(out_nl, pa.int64()),
                "n_kept": pa.array(out_nk, pa.int64()),
                "clean_text": pa.array(out_text, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow"
    )
