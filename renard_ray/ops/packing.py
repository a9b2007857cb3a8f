"""Sequence packing for LLM training data: assign documents to
fixed-size token blocks by position in the global token stream.

The GPT-style "concatenate everything, chunk every ``block_tokens``"
recipe, expressed over the corpus in doc-id order: a document whose
preceding documents total P tokens starts at stream offset P, so it
belongs to block ``P // block_tokens`` at offset ``P % block_tokens``
(long documents straddle into following blocks; the consumer slices).

Deterministic and SQL-checkable — the answer is exactly

    SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)

divided/mod'd by the cap, which makes this the one packing formulation
with an exact DuckDB oracle (greedy bin-packing variants are
partition-order-dependent and can't be oracle-checked).

Scale shape: one sort by doc_id, one vectorized per-block exclusive
prefix sum, an O(#blocks) driver scan over per-block token totals (the
carries), and one finalize pass — the sorted-run + boundary-stitch
machinery of ``events_running_total`` with a single global partition.
Token counts are whitespace tokens, byte-identical to
``token_stats.n_ws_tokens`` and its SQL form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .textstats import _WS_RE, _read_documents


def pack_blocks(sf_dir: str, block_tokens: int = 512) -> Dataset:
    """(doc_id, n_tokens, block_id, offset_in_block) for every
    document, doc-id stream order, blocks of ``block_tokens``."""

    def derive(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = [
            len(_WS_RE.split(t.strip())) if t and t.strip() else 0
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    sorted_ds = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(derive, batch_format="pyarrow")
        .sort("doc_id")
        .materialize()
    )

    # per block: exclusive local prefix + one summary row carrying the
    # block's first doc_id (ordering key) and token total
    def block_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "local_prev": pa.array([], pa.int64()),
                    "bk": pa.array([], pa.int64()),
                }
            )
        n = np.asarray(batch.column("n_tokens"), dtype=np.int64)
        prev = np.concatenate(([0], np.cumsum(n)[:-1]))
        first = batch.column("doc_id")[0].as_py()
        rows = pa.table(
            {
                "kind": pa.array(["r"] * len(n)),
                "doc_id": batch.column("doc_id"),
                "n_tokens": batch.column("n_tokens"),
                "local_prev": pa.array(prev),
                "bk": pa.array([first] * len(n), pa.int64()),
            }
        )
        summary = pa.table(
            {
                "kind": pa.array(["s"]),
                "doc_id": pa.array([first], pa.int64()),
                "n_tokens": pa.array([int(n.sum())], pa.int64()),
                "local_prev": pa.array([0], pa.int64()),
                "bk": pa.array([first], pa.int64()),
            }
        )
        return pa.concat_tables([rows, summary])

    marked = sorted_ds.map_batches(
        block_scan, batch_format="pyarrow", batch_size=None
    ).materialize()

    # O(#blocks) driver prefix-scan over the summaries
    summaries = marked.filter(expr="kind == 's'").to_pandas()
    summaries = summaries.sort_values("bk")
    carry_map: dict[int, int] = {}
    acc = 0
    for r in summaries.itertuples(index=False):
        carry_map[int(r.bk)] = acc
        acc += int(r.n_tokens)
    carry_ref = ray.put(carry_map)

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("kind"), "r"))
        cm = ray.get(carry_ref)
        bks = np.asarray(batch.column("bk"), dtype=np.int64)
        # bounded lookup: one carry per distinct block key in the batch
        carries = np.array([cm[int(b)] for b in np.unique(bks)], dtype=np.int64)
        prev = (
            np.asarray(batch.column("local_prev"), dtype=np.int64)
            + carries[np.searchsorted(np.unique(bks), bks)]
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": batch.column("n_tokens"),
                "block_id": pa.array(prev // block_tokens),
                "offset_in_block": pa.array(prev % block_tokens),
            }
        )

    return marked.map_batches(finalize, batch_format="pyarrow")
