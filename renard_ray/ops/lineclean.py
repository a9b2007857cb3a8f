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

from renard_ray.ops.hashagg import hash_aggregate as _hagg_auto

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


# ---------------------------------------------------------------------------
# domain-level boilerplate removal (CCNet / trafilatura-style)
# ---------------------------------------------------------------------------


def _page_domain(url: str) -> str:
    """Boilerplate grouping key: host + first path segment.  Real
    crawls group by registered domain; the fixture corpus shares one
    host, so the first path segment (its source shard) plays the
    domain role — the choice is a parameterizable partitioning key,
    not a semantic claim."""
    from urllib.parse import urlsplit

    try:
        p = urlsplit(url)
    except ValueError:
        return url
    host = (p.hostname or "").lower()
    seg = p.path.split("/")[1] if p.path.startswith("/") else ""
    return f"{host}/{seg}"


def domain_boilerplate_lines(
    pages: Dataset,
    min_frac: float = 0.5,
    min_pages: int = 5,
    line_budget: int = 2_000_000,
):
    """The CCNet-family structural dedup: a LINE (paragraph) appearing
    on >= ``min_frac`` of a domain's pages is chrome (nav, cookie
    banner, legal footer), not content — per-site frequency is the
    signal no single-document filter can see.

    Returns ``(lines_tab, domain_counts)``: an Arrow table of
    (domain, line, n_pages) boilerplate lines and a dict of per-domain
    page totals.  Shape: per-page DISTINCT lines (the combiner — a
    line repeated within one page counts once), ONE (domain, line)
    groupby over short line strings, then the per-domain threshold
    applied against the broadcast-scale domain page counts (|domains|
    rows).  Boilerplate sets are small BY CONSTRUCTION (only lines on
    half a domain's pages qualify), so the collected table is bounded;
    a loud guard trips past ``line_budget`` rather than silently
    degrading."""
    import ray
    from ray.data.aggregate import Count

    def page_lines(batch: pa.Table) -> pa.Table:
        domains, lines = [], []
        for url, text in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            d = _page_domain(url)
            for ln in {l.strip() for l in (text or "").split("\n") if l.strip()}:
                domains.append(d)
                lines.append(ln)
        return pa.table(
            {
                "domain": pa.array(domains, pa.string()),
                "line": pa.array(lines, pa.string()),
            }
        )

    def page_domains(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain": pa.array(
                    [_page_domain(u) for u in batch.column("url").to_pylist()],
                    pa.string(),
                )
            }
        )

    key_cols = pages.select_columns(["url", "text"]).materialize()
    per_domain = (
        _hagg_auto(key_cols.map_batches(page_domains, batch_format="pyarrow"), "domain", [('', 'count_all', 'n_pages')])
        .to_pandas()
    )
    totals = dict(zip(per_domain["domain"], per_domain["n_pages"]))

    counts = (
        _hagg_auto(key_cols.map_batches(page_lines, batch_format="pyarrow"), ["domain", "line"], [('', 'count_all', 'n_pages')])
    )

    thr_ref = ray.put(
        {
            d: max(min_pages, -(-int(n * min_frac * 1000) // 1000))
            for d, n in totals.items()
        }
    )

    def flag(batch: pa.Table) -> pa.Table:
        # vectorized: this pass runs over every distinct (domain, line)
        # in the corpus — no Python row loop
        thr = ray.get(thr_ref)
        df = batch.select(["domain", "n_pages"]).to_pandas()
        need = df["domain"].map(thr).fillna(float("inf"))
        return batch.filter(pa.array((df["n_pages"] >= need).to_numpy()))

    bp = counts.map_batches(flag, batch_format="pyarrow")
    from renard_ray.ops.relational import _collect_small

    tab = _collect_small(bp, line_budget)
    if tab is None:
        raise ValueError(
            "domain_boilerplate_lines: boilerplate line set exceeds "
            f"{line_budget} rows — thresholds too loose for this corpus"
        )
    return tab.combine_chunks(), totals


def strip_domain_boilerplate(
    pages: Dataset, min_frac: float = 0.5, min_pages: int = 5
) -> Dataset:
    """Apply pass: remove each domain's boilerplate lines from its
    pages (one broadcast of the bounded boilerplate set, one streaming
    rewrite; page payloads never shuffle).  Output adds
    ``n_lines_removed`` and rewrites ``text``."""
    import ray

    lines_tab, _totals = domain_boilerplate_lines(
        pages, min_frac=min_frac, min_pages=min_pages
    )
    bp: dict[str, set] = {}
    for d, ln in zip(
        lines_tab.column("domain").to_pylist(), lines_tab.column("line").to_pylist()
    ):
        bp.setdefault(d, set()).add(ln)
    bp_ref = ray.put(bp)

    def scrub(batch: pa.Table) -> pa.Table:
        table = ray.get(bp_ref)
        out_text, removed = [], []
        for url, text in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            bad = table.get(_page_domain(url), ())
            kept, n_rm = [], 0
            for ln in (text or "").split("\n"):
                if ln.strip() and ln.strip() in bad:
                    n_rm += 1
                else:
                    kept.append(ln)
            out_text.append("\n".join(kept))
            removed.append(n_rm)
        cols = {name: batch.column(name) for name in batch.schema.names}
        cols["text"] = pa.array(out_text, pa.large_string())
        cols["n_lines_removed"] = pa.array(removed, pa.int64())
        return pa.table(cols)

    return pages.map_batches(scrub, batch_format="pyarrow")
