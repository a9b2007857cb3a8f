"""Ray Data stages of the KG-construction pipeline (per-document part).

Design (SURVEY.md §7):
- ``extract_text_batch`` — stateless ``map_batches`` fn: html -> text,
  enforcing the per-row invariant that our extraction is byte-identical
  to the stored ``text`` column (``BASELINE.json input_hint``); counts
  mismatches instead of failing, drops ``html`` immediately so the big
  binary column never travels further down the pipeline.
- ``DocKernel`` — the fused per-document NLP chain (tokenize -> NER ->
  coref -> unify -> edge extraction) as an actor-pool class: lexicons /
  gazetteers are built once per actor in ``__init__`` (the reference
  loads models in ``_pipeline_init_`` once per run,
  ``renard/pipeline/core.py:608-625``); ``__call__`` processes one
  Arrow batch of pages and emits exploded edge/alias rows.

Fusing the whole per-doc chain into ONE stage is deliberate: the
intermediate per-doc state (tokens, entities, chains) is large and
row-local; materializing it between stages would move tens of TB
through the object store for nothing.  Per-document state remains
inspectable through ``doc_state_batch`` (the PipelineState-as-a-table
debug surface).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from renard_ray.textproc.document import DocConfig, emit_rows, process_document
from renard_ray.textproc.html import extract_text

EDGES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.float64()),
        ("polarity", pa.float64()),
        ("block_id", pa.int32()),
        ("url", pa.string()),
    ]
)


def extract_text_batch(batch: pa.Table, langs: tuple[str, ...] | None = None) -> pa.Table:
    """html -> text with the byte-identical invariant check.

    Emits columns: url, warc_ts, text, lang, text_ok (bool).  The
    stored ``text`` is authoritative (the invariant says they must be
    equal; on mismatch we keep the stored text and flag the row).
    ``langs`` folds the language filter into this pass (a standalone
    Filter operator costs a full extra scan).
    """
    if langs:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.is_in(batch.column("lang"), value_set=pa.array(list(langs)))
        )
    html_col = batch.column("html").to_pylist()
    text_col = batch.column("text").to_pylist()
    ok = []
    for h, t in zip(html_col, text_col):
        extracted = extract_text(h) if h is not None else ""
        ok.append(extracted == (t or ""))
    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "text": batch.column("text"),
        "lang": batch.column("lang"),
        "text_ok": pa.array(ok, pa.bool_()),
    }
    return pa.table(cols)


def doc_kernel_batch(batch: pa.Table, cfg: DocConfig, max_text_len: int = 2_000_000) -> pa.Table:
    """Task-form of the doc kernel (see ``DocKernel``): for CPU-only
    rule kernels, plain tasks beat an actor pool — no actor-startup
    latency, elastic scaling — because the only per-worker state
    (lexicons) is a module-level singleton loaded once per worker
    process.  Model-backed deployments use the ``DocKernel`` actor
    class instead (weights in ``__init__``)."""
    kernel = DocKernel.__new__(DocKernel)
    kernel.cfg = cfg
    kernel.max_text_len = max_text_len
    return next(kernel(batch))


class DocKernel:
    """Actor-pool stage: one Arrow batch of pages in, edge/alias rows out.

    Reference analog: the whole preconfigured step chain
    (``renard/pipeline/preconfigured.py:6-47``) run per document.  On a
    real cluster the rule NER/coref inside ``process_document`` is
    swapped for BERT actors producing the same schemas; the fused
    emit logic is unchanged.
    """

    def __init__(self, cfg: DocConfig | None = None, max_text_len: int = 2_000_000):
        # once-per-actor setup: force-load lexicons/gazetteer singletons
        from renard_ray.resources.hypocorisms import shared_gazetteer

        shared_gazetteer("eng")
        self.cfg = cfg or DocConfig()
        self.max_text_len = max_text_len

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        from renard_ray.textproc.document import METRIC

        cfg = self.cfg
        out: dict[str, list] = {
            "subj": [],
            "pred": [],
            "obj": [],
            "weight": [],
            "polarity": [],
            "block_id": [],
            "url": [],
        }
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else ["eng"] * len(urls)
        )
        n_truncated = 0
        for url, text, lang in zip(urls, texts, langs):
            if not text:
                continue
            # straggler guard: cap giant documents (counted, not dropped)
            if len(text) > self.max_text_len:
                n_truncated += 1
                text = text[: self.max_text_len]
            res = process_document(text, cfg, lang or "eng")
            rows = emit_rows(res, url, include_url=cfg.emit_url)
            for k in out:
                out[k].extend(rows[k])

        # per-batch metric rows (aggregated by the checkpoint runner /
        # dropped before the triple aggregate): per-row text invariant
        # violations (BASELINE per-row invariant) + truncation count
        metrics = {"docs": float(len(urls)), "truncated": float(n_truncated)}
        if "text_ok" in batch.column_names:
            import pyarrow.compute as pc

            n_bad = batch.num_rows - (pc.sum(pc.cast(batch.column("text_ok"), pa.int8())).as_py() or 0)
            metrics["text_mismatch"] = float(n_bad)
        for name, val in metrics.items():
            out["subj"].append(name)
            out["pred"].append(METRIC)
            out["obj"].append("")
            out["weight"].append(val)
            out["polarity"].append(0.0)
            out["block_id"].append(-1)
            out["url"].append("")
        t = pa.table(
            {
                "subj": pa.array(out["subj"], pa.string()),
                "pred": pa.array(out["pred"], pa.string()),
                "obj": pa.array(out["obj"], pa.string()),
                "weight": pa.array(out["weight"], pa.float64()),
                "polarity": pa.array(out["polarity"], pa.float64()),
                "block_id": pa.array(out["block_id"], pa.int32()),
                "url": pa.array(out["url"], pa.string()),
            }
        )
        if not cfg.emit_url and t.num_rows:
            # cross-document combine within the batch: hub entities
            # repeat the same (subj, pred, obj) across most documents,
            # so this collapses the stage output (and every downstream
            # pass and shuffle) several-fold.  Summing is correct for
            # every row kind: edge weights, name counts, alias
            # multiplicity and metric counters are all additive.
            g = t.group_by(["subj", "pred", "obj", "block_id", "url"]).aggregate(
                [("weight", "sum"), ("polarity", "sum")]
            )
            # select by NAME before the positional rename — robust to
            # pyarrow changing the key/aggregate output column order
            g = g.select(
                ["subj", "pred", "obj", "block_id", "url", "weight_sum", "polarity_sum"]
            )
            t = g.rename_columns(
                ["subj", "pred", "obj", "block_id", "url", "weight", "polarity"]
            )
        yield t


def doc_state_batch(batch: pa.Table, cfg: DocConfig | None = None) -> pa.Table:
    """Per-document NLP state as a TABLE row (the reference's
    ``PipelineState``, ``renard/pipeline/core.py:154-201``, re-expressed
    columnar): one row per document with counts + the unified character
    list (names, gender, mention count) as a nested column.  Debug /
    inspection surface; the production path emits edges directly."""
    cfg = cfg or DocConfig()
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else ["eng"] * len(urls)
    )
    out = {
        "url": [], "n_tokens": [], "n_sentences": [], "n_entities": [],
        "n_corefs": [], "n_quotes": [], "n_characters": [], "characters": [],
    }
    for url, text, lang in zip(urls, texts, langs):
        if not text:
            continue
        res = process_document(text[:2_000_000], cfg, lang or "eng")
        out["url"].append(url)
        out["n_tokens"].append(res.tok.n_tokens())
        out["n_sentences"].append(len(res.tok.sent_bounds))
        out["n_entities"].append(len(res.entities))
        out["n_corefs"].append(len(res.corefs))
        out["n_quotes"].append(len(res.quotes))
        out["n_characters"].append(len(res.characters))
        out["characters"].append(
            [
                {
                    "names": sorted(c.names),
                    "gender": int(c.gender),
                    "n_mentions": len(c.mentions),
                }
                for c in res.characters
            ]
        )
    char_type = pa.list_(
        pa.struct(
            [
                ("names", pa.list_(pa.string())),
                ("gender", pa.int8()),
                ("n_mentions", pa.int32()),
            ]
        )
    )
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int32()),
            "n_sentences": pa.array(out["n_sentences"], pa.int32()),
            "n_entities": pa.array(out["n_entities"], pa.int32()),
            "n_corefs": pa.array(out["n_corefs"], pa.int32()),
            "n_quotes": pa.array(out["n_quotes"], pa.int32()),
            "n_characters": pa.array(out["n_characters"], pa.int32()),
            "characters": pa.array(out["characters"], char_type),
        }
    )
