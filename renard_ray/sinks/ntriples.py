"""N-Triples export sink — the RDF interchange view of the KG.

A knowledge-graph engine's edge list should load into standard RDF
tooling; N-Triples (W3C REC, one triple per line, trivially
concatenable) is the canonical bulk-interchange format.  Entities and
predicates mint IRIs under a base namespace (percent-encoded local
names per RFC 3987); the numeric edge weight is emitted as a SECOND
line reifying the co-occurrence count via a deterministic
per-edge statement IRI, so nothing from the parquet graph is lost.

Distributed shape: one ``map_batches`` pass — each task serializes its
block to one ``part-<md5>.nt`` shard (the shard name is the md5 of the
shard's own content, so retries are idempotent: a re-executed task
rewrites the identical file) and returns a (shard, n_triples) manifest
row.  Nothing graph-sized ever lands on the driver; shards concatenate
into one valid .nt file with ``cat``.

No counterpart in the reference (Renard exports GEXF only —
``renard/graph_utils.py``); sibling of ``sinks/gexf.py``.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse

import pyarrow as pa

from ray.data import Dataset

__all__ = ["write_ntriples", "ESCAPES"]

# N-Triples string-literal escapes (W3C N-Triples §2.3 ECHAR)
ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _iri_local(name: str) -> str:
    """Percent-encode a node/predicate name into an IRI local part
    (RFC 3987 — spaces and angle-bracket-unsafe chars encoded)."""
    return urllib.parse.quote(name, safe="")


def _literal(s: str) -> str:
    out = []
    for ch in s:
        out.append(ESCAPES.get(ch, ch))
    return '"' + "".join(out) + '"'


def write_ntriples(
    triples: Dataset,
    path: str,
    base_iri: str = "https://example.org/kg/",
) -> "list[dict]":
    """Serialize the (subj, pred, obj, weight) edge Dataset to
    N-Triples shards under ``path``; returns the shard manifest
    (shard file name, triple-line count) as a list of dicts.

    Stale ``part-*.nt`` shards from a previous attempt are cleared
    first (the ``write_graph`` convention — the sink is the cheap
    final stage and is always rewritten)."""
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.startswith("part-") and f.endswith(".nt"):
            os.remove(os.path.join(path, f))

    ent = base_iri + "entity/"
    rel = base_iri + "rel/"
    stmt = base_iri + "statement/"
    w_pred = f"<{base_iri}prop/weight>"

    def dump(batch: pa.Table) -> pa.Table:
        lines: list[str] = []
        for s, p, o, w in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("weight").to_pylist(),
        ):
            si = f"<{ent}{_iri_local(s)}>"
            pi = f"<{rel}{_iri_local(p)}>"
            oi = f"<{ent}{_iri_local(o)}>"
            lines.append(f"{si} {pi} {oi} .")
            # weight reification: deterministic statement IRI from the
            # edge key, so re-runs emit identical bytes
            key = hashlib.md5(
                f"{s}\x1f{p}\x1f{o}".encode()
            ).hexdigest()[:16]
            wv = int(w) if w is not None and float(w).is_integer() else w
            lines.append(
                f"<{stmt}{key}> {w_pred} "
                f'"{wv}"^^<http://www.w3.org/2001/XMLSchema#decimal> .'
            )
        blob = ("\n".join(lines) + "\n").encode() if lines else b""
        shard = f"part-{hashlib.md5(blob).hexdigest()}.nt"
        if blob:
            with open(os.path.join(path, shard), "wb") as fh:
                fh.write(blob)
        return pa.table(
            {
                "shard": pa.array([shard] if blob else [], pa.string()),
                "n_lines": pa.array([len(lines)] if blob else [], pa.int64()),
            }
        )

    manifest = triples.map_batches(
        dump, batch_format="pyarrow", batch_size=None
    ).take_all()
    return manifest
