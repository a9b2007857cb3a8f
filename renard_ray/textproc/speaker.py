"""Rule-based quote speaker attribution.

Interface parity with the reference's ``BertSpeakerDetector``
(``renard/pipeline/speaker_attribution.py:21-136``): given quotes and
characters, produce ``speakers`` — one ``Optional[character]`` per quote
(None when no confident prediction, reference ``:120-124``).  The
SpanBERT model is unavailable offline; this deterministic rule detector
is the default producer of the same schema, and the actor-pool stage
accepts any drop-in producing it.

Rule: look for an attribution verb ("said", "replied", …) within
``window`` tokens after the quote's closing token (or before the opening
token); the speaker is the character owning the PER mention nearest to
that verb.  Mentions *inside* the quote are never speakers.
"""

from __future__ import annotations

from renard_ray.textproc.quotes import Quote
from renard_ray.textproc.unify import Character

ATTRIBUTION_VERBS = frozenset(
    {
        "said",
        "says",
        "replied",
        "answered",
        "cried",
        "asked",
        "observed",
        "exclaimed",
        "whispered",
        "shouted",
        "added",
        "continued",
        "returned",
        "remarked",
        "muttered",
    }
)


def attribute_speakers(
    tokens: list[str],
    quotes: list[Quote],
    characters: list[Character],
    window: int = 10,
) -> list[str | None]:
    """Return one speaker key (``Character.most_frequent_name``) or None
    per quote."""
    from renard_ray.textproc.graph import _char_key

    # token index -> character key for mention starts (outside quotes)
    mention_at: dict[int, str] = {}
    for c in characters:
        key = _char_key(c)
        for m in c.mentions:
            mention_at.setdefault(m.start, key)

    speakers: list[str | None] = []
    n = len(tokens)
    for q in quotes:
        speaker: str | None = None
        # scan after the quote: verb then mention (or mention then verb)
        lo, hi = q.end, min(n, q.end + window)
        verb_pos = next(
            (i for i in range(lo, hi) if tokens[i].lower() in ATTRIBUTION_VERBS),
            None,
        )
        if verb_pos is not None:
            # nearest mention start within the window after the quote
            best = None
            for i in range(lo, hi):
                if i in mention_at and not (q.start <= i < q.end):
                    d = abs(i - verb_pos)
                    if best is None or d < best[0]:
                        best = (d, mention_at[i])
            if best is not None:
                speaker = best[1]
        if speaker is None:
            # "X said" just before the opening quote
            lo2, hi2 = max(0, q.start - window), q.start
            verb_pos = next(
                (
                    i
                    for i in range(lo2, hi2)
                    if tokens[i].lower() in ATTRIBUTION_VERBS
                ),
                None,
            )
            if verb_pos is not None:
                best = None
                for i in range(lo2, hi2):
                    if i in mention_at:
                        d = abs(i - verb_pos)
                        if best is None or d < best[0]:
                            best = (d, mention_at[i])
                if best is not None:
                    speaker = best[1]
        speakers.append(speaker)
    return speakers
