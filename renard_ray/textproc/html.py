"""HTML -> text extraction.

The engine's page schema (``BASELINE.json input_hint``) carries both
``html: binary`` and ``text: string``; the per-row invariant is that our
extraction of ``html`` is byte-identical to the stored ``text``.  This
module implements a deterministic block-level extractor: block tags
(``p``, ``h1``..``h6``, ``li``, ``div`` …) become paragraphs joined by
a blank line, scripts/styles/head are dropped, entities are unescaped,
intra-paragraph whitespace is collapsed.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_RE = re.compile(r"<(script|style|head)\b.*?</\1\s*>", re.S | re.I)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|section|article)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract readable text from an HTML document."""
    if isinstance(html_bytes, bytes):
        try:
            raw = html_bytes.decode("utf-8")
        except UnicodeDecodeError:
            raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    raw = _SCRIPT_RE.sub(" ", raw)
    # block tags become paragraph separators
    raw = _BLOCK_TAG_RE.sub("\n\n", raw)
    raw = _TAG_RE.sub("", raw)
    raw = _html.unescape(raw)
    paragraphs = []
    for para in raw.split("\n\n"):
        para = _WS_RE.sub(" ", para).strip()
        # collapse single newlines inside a paragraph
        para = " ".join(line.strip() for line in para.split("\n") if line.strip())
        if para:
            paragraphs.append(para)
    return "\n\n".join(paragraphs)


def wrap_text_as_html(text: str, title: str = "") -> bytes:
    """Inverse used by the fixture generator: produce HTML whose
    ``extract_text`` output is byte-identical to ``text`` (for texts
    whose paragraphs are already whitespace-normalized)."""
    paras = "".join(
        f"<p>{_html.escape(p)}</p>" for p in text.split("\n\n") if p.strip()
    )
    doc = (
        f"<html><head><title>{_html.escape(title)}</title></head>"
        f"<body>{paras}</body></html>"
    )
    return doc.encode("utf-8")
