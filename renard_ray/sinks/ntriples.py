"""N-Triples export sink — the RDF interchange view of the KG.

A knowledge-graph engine's edge list should load into standard RDF
tooling; N-Triples (W3C REC, one triple per line, trivially
concatenable) is the canonical bulk-interchange format.  Entities and
predicates mint IRIs under a base namespace (percent-encoded local
names per RFC 3987).  Edge weights are exported via STANDARD RDF
reification — per aggregated edge one ``rdf:Statement`` resource with
``rdf:subject`` / ``rdf:predicate`` / ``rdf:object`` plus the weight —
so any triple store can join a weight back to its edge without
knowing this module's conventions.

The input edge list is AGGREGATED first (one ``hash_aggregate`` on
(subj, pred, obj) summing weight): dynamic-block graphs persist one
row per block, and emitting per-block rows raw would mint conflicting
weight statements under one edge (the GEXF sink sums the same way).
``polarity`` / ``block_id`` attributes have no N-Triples
representation and are NOT exported — they stay in the parquet graph
(callers are warned by the CLI when present).

Distributed shape: one ``map_batches`` pass — each task serializes
its block to one ``part-<md5>.nt`` shard (content-addressed: retries
rewrite identical bytes) and returns a (shard, n_lines) manifest row;
rows are unique after the aggregate, so distinct non-empty blocks
cannot collide on a shard name.  ``path`` must be storage every
worker AND the driver can reach (single node, NFS, fuse mount): the
sink re-checks each manifest shard's existence from the driver and
raises — loudly, not truncating — if a worker wrote somewhere else.

No counterpart in the reference (Renard exports GEXF only —
``renard/graph_utils.py``); sibling of ``sinks/gexf.py``.
"""

from __future__ import annotations

import hashlib
import math
import os
import urllib.parse
from decimal import Decimal

import pyarrow as pa

from ray.data import Dataset

__all__ = ["write_ntriples"]

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"


def _iri_local(name: str) -> str:
    """Percent-encode a node/predicate name into an IRI local part
    (RFC 3987 — spaces and angle-bracket-unsafe chars encoded)."""
    return urllib.parse.quote(name, safe="")


def _decimal_lexical(w: float) -> str:
    """xsd:decimal lexical form: fixed-point, NO exponent (repr's
    '1e-05' is outside the lexical space and strict parsers reject
    it); integral values drop the fraction.  Non-finite weights raise
    — 'NaN'/'Infinity' are outside the lexical space too, and the
    sink's contract is fail-loudly, never emit an invalid triple."""
    w = float(w)
    if not math.isfinite(w):
        raise ValueError(
            f"ntriples: non-finite edge weight {w!r} has no xsd:decimal "
            "lexical form"
        )
    d = Decimal(repr(w))
    if d == d.to_integral_value():
        return str(int(d))
    return format(d, "f")


def write_ntriples(
    triples: Dataset,
    path: str,
    base_iri: str = "https://example.org/kg/",
) -> "list[dict]":
    """Serialize the (subj, pred, obj, weight) edge Dataset to
    N-Triples shards under ``path``; returns the shard manifest
    (unique shard file name, triple-line count) as a list of dicts.

    Stale ``part-*.nt`` shards from a previous attempt are cleared
    first (the ``write_graph`` convention — the sink is the cheap
    final stage and is always rewritten)."""
    from renard_ray.ops.hashagg import hash_aggregate

    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.startswith("part-") and f.endswith(".nt"):
            os.remove(os.path.join(path, f))

    agg = hash_aggregate(
        triples.select_columns(["subj", "pred", "obj", "weight"]),
        ["subj", "pred", "obj"],
        [("weight", "sum", "weight")],
    )

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
            # STANDARD reification: the statement resource links back
            # to its edge with rdf:subject/predicate/object, so the
            # weight is recoverable by any RDF consumer (the statement
            # IRI itself is just a stable name — md5 of the edge key)
            key = hashlib.md5(
                f"{s}\x1f{p}\x1f{o}".encode()
            ).hexdigest()[:16]
            st = f"<{stmt}{key}>"
            lines.append(f"{st} <{_RDF}type> <{_RDF}Statement> .")
            lines.append(f"{st} <{_RDF}subject> {si} .")
            lines.append(f"{st} <{_RDF}predicate> {pi} .")
            lines.append(f"{st} <{_RDF}object> {oi} .")
            if w is not None:  # null weight: reification core only
                lines.append(
                    f"{st} {w_pred} "
                    f'"{_decimal_lexical(w)}"^^<{_XSD_DECIMAL}> .'
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

    rows = agg.map_batches(
        dump, batch_format="pyarrow", batch_size=None
    ).take_all()
    # unique rows after the aggregate => distinct non-empty blocks
    # cannot produce identical bytes; dedupe defensively anyway
    manifest: dict[str, dict] = {}
    for r in rows:
        manifest[r["shard"]] = r
    missing = [
        s for s in manifest
        if not os.path.exists(os.path.join(path, s))
    ]
    assert not missing, (
        "write_ntriples: %d shard(s) missing from %r — workers wrote "
        "to node-local storage the driver cannot see; point `path` at "
        "storage shared by every node (the output would otherwise "
        "truncate silently): %r" % (len(missing), path, missing[:3])
    )
    return list(manifest.values())
