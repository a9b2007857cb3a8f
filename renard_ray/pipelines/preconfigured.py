"""Preconfigured pipeline presets.

Capability parity with the reference's preconfigured pipelines
(``renard/pipeline/preconfigured.py:6-149``):

- ``co_occurrence_config``   — tokenize -> NER -> (coref) -> graph-rule
  unification -> co-occurrence edges (the canonical chain,
  ``preconfigured.py:6-47``).
- ``conversational_config``  — + quotes, speaker attribution,
  talks_with / mentions edges (``preconfigured.py:50-96``).
- ``relational_config``      — + typed relation extraction
  (``preconfigured.py:99-149``).
- ``full_config``            — everything (sentiment + conversations +
  relations), the bench flagship.
"""

from __future__ import annotations

from renard_ray.pipelines.kg import KGConfig
from renard_ray.textproc.document import DocConfig


def co_occurrence_config(
    co_occurrences_dist: tuple[int, str] = (1, "sentences"),
    with_corefs: bool = True,
    dynamic_window: int | None = None,
    dynamic_overlap: int = 0,
    min_appearances: int = 1,
) -> KGConfig:
    return KGConfig(
        doc=DocConfig(
            co_occurrences_dist=co_occurrences_dist,
            with_corefs=with_corefs,
            dynamic_window=dynamic_window,
            dynamic_overlap=dynamic_overlap,
            min_appearances=min_appearances,
        )
    )


def conversational_config(
    conversation_dist: tuple[int, str] = (1, "sentences"),
) -> KGConfig:
    return KGConfig(
        doc=DocConfig(
            with_conversations=True,
            with_quote_mentions=True,
            conversation_dist=conversation_dist,
        )
    )


def relational_config(min_rel_occurrences: int = 1) -> KGConfig:
    return KGConfig(
        doc=DocConfig(with_relations=True, min_rel_occurrences=min_rel_occurrences)
    )


def full_config() -> KGConfig:
    return KGConfig(
        doc=DocConfig(
            with_sentiment=True,
            with_conversations=True,
            with_quote_mentions=True,
            with_relations=True,
        )
    )


PRESETS = {
    "co_occurrence": co_occurrence_config,
    "conversational": conversational_config,
    "relational": relational_config,
    "full": full_config,
}
