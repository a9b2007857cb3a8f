"""WARC-style record-framed page archives (read + write).

Reference semantics analog: the reference ingests one plain-text
novel per run (``renard/pipeline/core.py`` takes a ``text`` kwarg);
a web-scale corpus instead arrives as crawl ARCHIVES — thousands of
record-framed files, each a concatenation of (headers, payload)
records — and the engine must parse them distributedly.  This module
implements a simplified but binary-safe WARC-shaped format:

    WARX/1.0\\r\\n
    Target-URI: <url>\\r\\n
    Date: <iso-8601, microseconds>\\r\\n
    Language: <lang>\\r\\n
    Content-Length: <payload bytes>\\r\\n
    \\r\\n
    <payload (html bytes)>\\r\\n\\r\\n

Framing is by ``Content-Length`` (never by scanning the payload for a
delimiter), so arbitrary binary payloads round-trip — the property
that makes real WARC parseable at all.

Scale shape: the unit of parallelism is the FILE (exactly how real
Common-Crawl WARCs are processed — one ~1 GB archive per task):
``ray.data.read_binary_files`` streams file bytes into tasks, and one
``map_batches`` pass parses records and re-derives ``text`` with the
same ``extract_text`` kernel the parquet path uses, so downstream
stages see an identical pages schema.  Malformed records raise
LOUDLY (truncated payload, missing header, bad length) — a silently
skipped record is corpus loss nobody audits.
"""

from __future__ import annotations

import datetime as _dt
import os

import pyarrow as pa
import ray
from ray.data import Dataset

_MAGIC = b"WARX/1.0\r\n"


def write_pages_warclike(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    records_per_file: int = 100,
) -> list[str]:
    """Synthesize the deterministic pages corpus as record-framed
    ``.warx`` archives; returns the file paths."""
    from renard_ray.sources.pages import generate_pages_table

    tab = generate_pages_table(n_pages, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    urls = tab.column("url").to_pylist()
    tss = tab.column("warc_ts").to_pylist()
    htmls = tab.column("html").to_pylist()
    langs = tab.column("lang").to_pylist()
    for start in range(0, n_pages, records_per_file):
        path = os.path.join(out_dir, f"part-{start // records_per_file:05d}.warx")
        with open(path, "wb") as f:
            for i in range(start, min(start + records_per_file, n_pages)):
                payload = htmls[i]
                f.write(_MAGIC)
                f.write(f"Target-URI: {urls[i]}\r\n".encode("utf-8"))
                f.write(f"Date: {tss[i].isoformat()}\r\n".encode("ascii"))
                f.write(f"Language: {langs[i]}\r\n".encode("ascii"))
                f.write(f"Content-Length: {len(payload)}\r\n".encode("ascii"))
                f.write(b"\r\n")
                f.write(payload)
                f.write(b"\r\n\r\n")
        paths.append(path)
    return paths


def parse_warclike_bytes(blob: bytes, path: str = "<mem>") -> pa.Table:
    """Parse one archive's bytes into pages rows (url, warc_ts, html,
    text, lang).  Raises ``ValueError`` on any malformed record."""
    from renard_ray.sources.pages import PAGES_SCHEMA
    from renard_ray.textproc.html import extract_text

    urls: list[str] = []
    tss: list[_dt.datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    pos, end = 0, len(blob)
    while pos < end:
        if not blob.startswith(_MAGIC, pos):
            raise ValueError(
                f"warclike: bad record magic at byte {pos} of {path}"
            )
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"warclike: unterminated header block in {path}")
        headers: dict[str, str] = {}
        for line in blob[pos + len(_MAGIC): hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b": ")
            if not sep:
                raise ValueError(
                    f"warclike: malformed header line {line!r} in {path}"
                )
            headers[k.decode("ascii")] = v.decode("utf-8")
        try:
            url = headers["Target-URI"]
            ts = _dt.datetime.fromisoformat(headers["Date"])
            lang = headers["Language"]
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"warclike: bad headers in {path}: {e}") from e
        if clen < 0:
            # a negative length would put body_end BEFORE the header
            # terminator, where blob[body_end:body_end+4] can happen to
            # equal \r\n\r\n — the parser would silently resume inside
            # the real payload (corpus corruption, not an error)
            raise ValueError(
                f"warclike: negative Content-Length {clen} for {url} in {path}"
            )
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > end or blob[body_end: body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"warclike: truncated or mis-framed payload for {url} in "
                f"{path} (Content-Length={clen})"
            )
        payload = blob[body_start:body_end]
        urls.append(url)
        tss.append(ts)
        htmls.append(payload)
        texts.append(extract_text(payload))
        langs.append(lang)
        pos = body_end + 4
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.large_string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def read_pages_warclike(path: str) -> Dataset:
    """Distributed pages Dataset from a directory of ``.warx``
    archives — schema-identical to the parquet ``read_pages`` path
    (``text`` re-derived from the payload with the same kernel)."""

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            parse_warclike_bytes(b.as_py(), p.as_py())
            for b, p in zip(batch.column("bytes"), batch.column("path"))
        ]
        tabs = [t for t in tabs if t.num_rows]
        from renard_ray.sources.pages import PAGES_SCHEMA

        return pa.concat_tables(tabs) if tabs else PAGES_SCHEMA.empty_table()

    return ray.data.read_binary_files(path, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )
