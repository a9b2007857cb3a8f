"""Rule-based quote detection.

Same FSM semantics as the reference's ``QuoteDetector``
(``renard/pipeline/quote_detection.py:17-71``): scan tokens; an opening
quote char starts a quote (if none is open); the next quote char of any
pair closes it.  Quote spans are token-index ``[start, end)`` including
both quote tokens.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_QUOTE_PAIRS: list[tuple[str, str]] = [
    ('"', '"'),
    ("``", "''"),
    ("«", "»"),
    ("“", "”"),
]


@dataclass(frozen=True)
class Quote:
    start: int  # token index of the opening quote char
    end: int  # one past the closing quote char


def detect_quotes(
    tokens: list[str],
    quote_pairs: list[tuple[str, str]] | None = None,
) -> list[Quote]:
    pairs = quote_pairs or DEFAULT_QUOTE_PAIRS
    openers = {a for a, _ in pairs}
    members = openers | {b for _, b in pairs}

    quotes: list[Quote] = []
    open_start: int | None = None
    for i, tok in enumerate(tokens):
        if tok not in members:
            continue
        if tok in openers and open_start is None:
            open_start = i
        elif open_start is not None:
            quotes.append(Quote(open_start, i + 1))
            open_start = None
    return quotes
