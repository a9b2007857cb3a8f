"""Distributed inverted index: bucket-partitioned postings with
pruned lookup.

The search-side primitive of a web-scale corpus: one tokenize pass
emits per-document DISTINCT terms, postings land in a hash-bucketed
hive-partitioned Parquet layout (``bucket=N/``), and an AND query
reads ONLY the buckets its terms hash to — index lookups touch
``|terms| / num_buckets`` of the index regardless of corpus size
(same partition-pruning story as the incremental graph ingest).

Stopword-scale terms are the skew hazard (a df ~ |corpus| term's
posting list is corpus-sized); ``max_df`` drops them at build time
with a logged count — the standard IR move (they carry no AND-query
selectivity anyway).
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

__all__ = ["build_inverted_index", "search_index", "doc_search_index"]

_PRETOK_RE = re.compile(r"[a-z']+")


def _bucket_of(term: str, num_buckets: int) -> int:
    return (
        int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "big")
        % num_buckets
    )


def build_inverted_index(
    docs: Dataset,
    out_dir: str,
    num_buckets: int = 64,
    max_df: int | None = None,
) -> None:
    """One tokenize pass -> distinct (term, doc_id) postings ->
    hive-partitioned Parquet by term-hash bucket.  ``max_df`` prunes
    stopword-scale terms via one bounded df reduce + a broadcast drop
    mask (logged).  Stale ``bucket=N`` dirs from a killed attempt are
    cleared first, as in the graph sink."""

    def postings(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        ids: list[int] = []
        bks: list[int] = []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for t in set(_PRETOK_RE.findall((txt or "").lower())):
                terms.append(t)
                ids.append(did)
                bks.append(_bucket_of(t, num_buckets))
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(bks, pa.int64()),
            }
        )

    rows = docs.map_batches(postings, batch_format="pyarrow")

    if max_df is not None:
        rows = rows.materialize()
        df = _hagg_auto(rows, "term", [('', 'count_all', 'df')])
        hot = df.filter(expr=f"df > {int(max_df)}")
        hot_terms = [r["term"] for r in hot.take_all()]
        if hot_terms:
            logging.getLogger(__name__).warning(
                "inverted index: dropping %d stopword-scale terms "
                "(df > %d)", len(hot_terms), max_df,
            )
            hot_ref = ray.put(pa.array(sorted(hot_terms), pa.string()))

            def drop_hot(batch: pa.Table) -> pa.Table:
                m = pc.is_valid(
                    pc.index_in(batch.column("term"), value_set=ray.get(hot_ref))
                )
                return batch.filter(pc.invert(m))

            rows = rows.map_batches(drop_hot, batch_format="pyarrow")

    if os.path.isdir(out_dir):
        for d in os.listdir(out_dir):
            if d.startswith("bucket="):
                shutil.rmtree(os.path.join(out_dir, d))
    rows.write_parquet(out_dir, partition_cols=["bucket"])


def search_index(
    index_dir: str,
    terms: "list[str]",
    num_buckets: int = 64,
) -> Dataset:
    """AND query over the index: reads ONLY the ``bucket=`` partitions
    the query terms hash to, filters to the terms, and keeps doc_ids
    matched by EVERY distinct term (one bounded groupby).  Output:
    (doc_id) rows, ascending."""
    tset = sorted(set(t.lower() for t in terms))
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if not tset:
        return ray.data.from_arrow(empty)
    paths = sorted(
        {
            os.path.join(index_dir, f"bucket={_bucket_of(t, num_buckets)}")
            for t in tset
        }
    )
    files = [
        os.path.join(p, f)
        for p in paths
        if os.path.isdir(p)
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    if not files:
        return ray.data.from_arrow(empty)
    tarr = pa.array(tset, pa.string())
    postings = ray.data.read_parquet(files, columns=["term", "doc_id"])

    def match(batch: pa.Table) -> pa.Table:
        m = pc.is_valid(pc.index_in(batch.column("term"), value_set=tarr))
        kept = batch.filter(m)
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "n": pa.array(np.ones(kept.num_rows, dtype=np.int64)),
            }
        )

    counts = (
        _hagg_auto(postings.map_batches(match, batch_format="pyarrow"), "doc_id", [('n', 'sum', 'n')])
    )
    want = len(tset)
    return (
        counts.filter(expr=f"n == {want}")
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


def doc_search_index(
    sf_dir: str,
    terms: "tuple[str, ...]" = ("filter", "merge"),
    num_buckets: int = 16,
) -> Dataset:
    """End-to-end: build the bucket-partitioned index for the
    documents table under /tmp, run the AND query through the pruned
    lookup.  Exact SQL oracle (the tokenizer is a regex DuckDB can
    replicate)."""
    from renard_ray.ops.textstats import _read_documents

    out = "/tmp/renard_invindex_" + hashlib.md5(
        f"{sf_dir}:{num_buckets}".encode()
    ).hexdigest()[:12]
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    build_inverted_index(docs, out, num_buckets=num_buckets)
    return search_index(out, list(terms), num_buckets=num_buckets)
