"""CSV(.gz) source and sink for the documents corpus.

The third interchange boundary next to Parquet (steady-state),
JSONL.gz (`sources/jsonl.py`) and the WARC-like archives
(`sources/warclike.py`): plenty of upstream corpus drops still ship
as gzipped CSV.  Both directions are Ray-Data native and
file-parallel; Arrow's RFC-4180 CSV writer/parser handles embedded
newlines, commas, quotes and non-ASCII text via quoting, so the
documents schema round-trips exactly.

Format caveats (inherent, documented): like JSONL, CSV cannot prune
columns at the read; unlike Parquet and JSONL, CSV carries NO type
information — types are re-inferred by Arrow on read (the documents
schema of int64/string survives; sources with nullable numerics widen
to nullable on read).
"""

from __future__ import annotations

import ray
from ray.data import Dataset

from renard_ray.sources.jsonl import _JsonlShardNames


def write_documents_csv(
    ds: Dataset, out_dir: str, *, compression: str | None = "gzip"
) -> None:
    """Write ``ds`` as CSV shards under ``out_dir`` (gzip by default).
    One shard per block — upstream block size is the shard-size knob."""
    suffix = ".csv.gz" if compression else ".csv"
    kwargs = {}
    if compression:
        kwargs["arrow_open_stream_args"] = {"compression": compression}
    ds.write_csv(out_dir, filename_provider=_JsonlShardNames(suffix), **kwargs)


def read_documents_csv(path: str, *, compression: str | None = "gzip") -> Dataset:
    """Distributed CSV read: one Arrow parse task per shard,
    stream-decompressed, types re-inferred."""
    kwargs = {}
    if compression:
        kwargs["arrow_open_stream_args"] = {"compression": compression}
    return ray.data.read_csv(path, file_extensions=None, **kwargs)


def documents_csv_roundtrip(sf_dir: str, out_dir: str | None = None) -> Dataset:
    """The ``doc_csv_roundtrip`` query: export the documents table as
    gzipped CSV shards and read them back — the oracle is the original
    table, so the value hash pins losslessness of every column."""
    import hashlib
    import shutil

    from renard_ray.ops.textstats import _read_documents

    if out_dir is None:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        out_dir = f"/tmp/renard_csv_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    write_documents_csv(_read_documents(sf_dir), out_dir)
    return read_documents_csv(out_dir)
