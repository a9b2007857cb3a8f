"""Golden single-process oracle for the KG pipeline.

Runs the exact per-document kernels (``renard_ray.textproc.document``)
sequentially on the driver — the reference's execution model
(``renard/pipeline/core.py:728-733``: one process, one document at a
time) — then performs the same cross-document canonicalization with
plain dicts.  The distributed Ray pipeline must reproduce these triples
at P/R >= 0.95 (``BASELINE.json``); in fact it reproduces them exactly,
since both share the per-doc code path and the canonicalization is a
deterministic relabeling.

The scorer implements the reference's own triple precision/recall
method (``renard/pipeline/relation_extraction.py:64-93``): precision =
|pred ∩ ref| / |pred|, recall = |pred ∩ ref| / |ref| over exact-match
triples.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from renard_ray.pipelines.kg import UNDIRECTED_PREDS, KGConfig
from renard_ray.textproc.document import (
    ALIAS_OF,
    NAME_COUNT,
    emit_rows,
    process_document,
)


def oracle_triples(
    pages: pa.Table, cfg: KGConfig | None = None
) -> list[tuple[str, str, str, int, float]]:
    """(subj, pred, obj, block_id, weight) aggregated canonical triples."""
    cfg = cfg or KGConfig()
    rows: dict[str, list] = {
        k: [] for k in ("subj", "pred", "obj", "weight", "polarity", "block_id", "url")
    }
    langs = set(cfg.langs)
    for i in range(pages.num_rows):
        lang = pages.column("lang")[i].as_py()
        if langs and lang not in langs:
            continue
        text = pages.column("text")[i].as_py()
        if not text:
            continue
        url = pages.column("url")[i].as_py()
        res = process_document(text[:2_000_000], cfg.doc, lang or "eng")
        r = emit_rows(res, url)
        for k in rows:
            rows[k].extend(r[k])

    # union-find over alias links
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    name_counts: dict[str, float] = defaultdict(float)
    for s, p, o, w in zip(rows["subj"], rows["pred"], rows["obj"], rows["weight"]):
        if p == ALIAS_OF and s != o:
            ra, rb = find(s), find(o)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
                parent.setdefault(lo, lo)
        elif p == NAME_COUNT:
            name_counts[s] += w

    # canonical display name per component (count desc, len desc, lex asc)
    best: dict[str, tuple] = {}
    for name, cnt in name_counts.items():
        label = find(name) if name in parent else name
        key = (cnt, len(name), [-ord(c) for c in name])
        if label not in best or key > best[label][0]:
            best[label] = (key, name)
    canon: dict[str, str] = {}
    for name in set(parent) | set(name_counts):
        label = find(name) if name in parent else name
        canon[name] = best.get(label, (None, label))[1]

    agg: dict[tuple[str, str, str, int], list[float]] = {}
    for s, p, o, w, pol, b in zip(
        rows["subj"], rows["pred"], rows["obj"], rows["weight"],
        rows["polarity"], rows["block_id"],
    ):
        if p in (ALIAS_OF, NAME_COUNT):
            continue
        cs, co = canon.get(s, s), canon.get(o, o)
        if p in UNDIRECTED_PREDS and co < cs:
            cs, co = co, cs
        if cs == co:
            continue
        key = (cs, p, co, b)
        if key not in agg:
            agg[key] = [0.0, 0.0]
        agg[key][0] += w
        agg[key][1] += pol
    return [(s, p, o, b, w) for (s, p, o, b), (w, _) in sorted(agg.items())]


def triple_precision_recall(
    pred: list[tuple], ref: list[tuple]
) -> tuple[float, float]:
    """Reference scorer semantics
    (``renard/pipeline/relation_extraction.py:64-93``)."""
    pred_set, ref_set = set(pred), set(ref)
    if not pred_set or not ref_set:
        return (0.0, 0.0)
    inter = len(pred_set & ref_set)
    return inter / len(pred_set), inter / len(ref_set)
