"""Per-document character unification (entity linking within one doc).

Re-implements the semantics of the reference's two unifiers:

- ``naive_unify``  — ``NaiveCharacterUnifier``
  (``renard/pipeline/character_unification.py:99-156``): one character
  per distinct PER surface string.
- ``graph_rules_unify`` — ``GraphRulesCharacterUnifier``
  (``character_unification.py:159-464``, Vala et al. 2015 style):
  an alias graph over distinct PER surface strings with positive link
  rules (hypocorism, title-removal match, same last name, same first
  name, optional shared-coref-chain), per-name gender inference
  (title, then coref pronoun majority,
  ``character_unification.py:411-452``), negative rules that cut all
  shortest paths between incompatible names (same last+different
  first, or conflicting gender, ``character_unification.py:293-327``),
  connected components as characters with majority-vote gender, coref
  mention assignment (``character_unification.py:48-96``) and a
  min-appearances filter.

Deliberate, documented divergences from the reference implementation
(not its intent):
- Node/pair iteration is in sorted-name order (the reference iterates a
  Python ``set``, which is run-nondeterministic); ties in majority votes
  break deterministically.
- The negative rule removes the *first edge of each shortest path*
  between the offending pair (paths are materialized before removal).
  This matches the reference's actual runtime behavior: it passes
  node-paths to ``nx.Graph.remove_edges_from``, which interprets a
  path ``[a, b, c]`` as the edge ``(a, b)`` with data ``c`` — i.e.
  only the first edge of each ≤3-node path is removed (longer paths
  would raise in the reference; we handle them by still removing the
  first edge).
- Last/first-name comparisons are case-insensitive in both positive and
  negative rules (the reference's negative rule compares last names
  case-sensitively, inconsistently with its positive rule).

This module is pure per-document Python shared by the distributed stage
and the oracle.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from itertools import combinations

import networkx as nx

from renard_ray.resources.hypocorisms import HypocorismGazetteer, shared_gazetteer
from renard_ray.resources.lexicons import (
    SINGULAR_DETERMINERS,
    Gender,
    is_female_pronoun,
    is_male_pronoun,
)
from renard_ray.textproc.names import parse_name, title_gender
from renard_ray.textproc.ner import Entity

Span = tuple[int, int]


@dataclass
class Mention:
    start: int
    end: int
    surface: str


@dataclass
class Character:
    """Reference analog: ``character_unification.py:18-45``."""

    names: frozenset[str]
    mentions: list[Mention] = field(default_factory=list)
    gender: Gender = Gender.UNKNOWN

    def longest_name(self) -> str | None:
        if not self.names:
            return None
        return max(self.names, key=lambda n: (len(n), n))

    def shortest_name(self) -> str | None:
        if not self.names:
            return None
        return min(self.names, key=lambda n: (len(n), n))

    def most_frequent_name(self) -> str | None:
        """Most frequent of the character's names among its mentions
        (``character_unification.py:34-39``); deterministic tie-break by
        (count desc, length desc, lexicographic).  Cached — called once
        per mention by key lookups in the hot path."""
        cached = getattr(self, "_mfn", None)
        if cached is not None:
            return cached
        out = self._most_frequent_name()
        object.__setattr__(self, "_mfn", out)
        return out

    def _most_frequent_name(self) -> str | None:
        counts = Counter(m.surface for m in self.mentions)
        counts = {n: c for n, c in counts.items() if n in self.names}
        if not counts:
            return self.longest_name()
        return max(counts, key=lambda n: (counts[n], len(n), [-ord(c) for c in n]))

    def sort_key(self) -> tuple:
        return tuple(sorted(self.names))


def _mention_from_entity(e: Entity, tokens: list[str]) -> Mention:
    return Mention(e.start, e.end, e.surface(tokens))


def assign_coreference_mentions(
    characters: list[Character], corefs: list[list[Span]], tokens: list[str]
) -> list[Character]:
    """Assign each coref chain to the character whose names occur most
    in the chain; discard chains with zero name occurrences
    (reference: ``character_unification.py:48-96``)."""
    char_mentions: list[set[tuple[int, int, str]]] = [
        {(m.start, m.end, m.surface) for m in c.mentions} for c in characters
    ]
    for chain in corefs:
        if not characters:
            break
        chain_mentions = [
            Mention(s, e, " ".join(tokens[s:e])) for s, e in chain
        ]
        best_i, best_count = 0, -1
        for i, c in enumerate(characters):
            count = sum(1 for m in chain_mentions if m.surface in c.names)
            if count > best_count:
                best_i, best_count = i, count
        if best_count == 0:
            continue
        for m in chain_mentions:
            char_mentions[best_i].add((m.start, m.end, m.surface))
    return [
        Character(
            c.names,
            [Mention(*t) for t in sorted(ms)],
            c.gender,
        )
        for c, ms in zip(characters, char_mentions)
    ]


def naive_unify(
    tokens: list[str],
    entities: list[Entity],
    corefs: list[list[Span]] | None = None,
    min_appearances: int = 0,
    character_tag: str = "PER",
) -> list[Character]:
    """One character per distinct PER surface string
    (``character_unification.py:115-144``)."""
    by_name: dict[str, list[Mention]] = {}
    for e in entities:
        if e.tag != character_tag:
            continue
        m = _mention_from_entity(e, tokens)
        by_name.setdefault(m.surface, []).append(m)
    characters = [Character(frozenset([n]), ms) for n, ms in by_name.items()]
    if corefs is not None:
        characters = assign_coreference_mentions(characters, corefs, tokens)
    return [c for c in characters if len(c.mentions) >= min_appearances]


def _strip_leading_determiner(name: str, lang: str) -> str:
    low = name.lower()
    for det in SINGULAR_DETERMINERS.get(lang, frozenset()):
        if low.startswith(det + " "):
            return name[len(det) + 1 :]
    return name


def _names_related_after_title_removal(
    name1: str, name2: str, lang: str, gaz: HypocorismGazetteer
) -> bool:
    """``character_unification.py:380-396``."""
    raw1 = parse_name(name1, lang).without_title
    raw2 = parse_name(name2, lang).without_title
    if raw1 == "" or raw2 == "":
        return False
    return raw1.lower() == raw2.lower() or gaz.are_related(raw1, raw2)


def _names_in_same_coref(
    name1: str, name2: str, corefs: list[list[Span]], tokens: list[str]
) -> bool:
    """``character_unification.py:398-409``: every chain containing one
    must contain the other, and at least one chain contains both."""
    once_together = False
    for chain in corefs:
        surfs = {" ".join(tokens[s:e]) for s, e in chain}
        in1, in2 = name1 in surfs, name2 in surfs
        if in1 != in2:
            return False
        if in1 and in2:
            once_together = True
    return once_together


def _infer_name_gender(
    name: str,
    corefs: list[list[Span]] | None,
    tokens: list[str],
    lang: str,
) -> Gender:
    """``character_unification.py:411-452``: title first, else majority
    of gendered pronouns across coref chains containing the name."""
    g = Gender(title_gender(parse_name(name, lang).title, lang))
    if g != Gender.UNKNOWN:
        return g
    if corefs is None:
        return Gender.UNKNOWN
    male = female = 0
    for chain in corefs:
        surfs = {" ".join(tokens[s:e]) for s, e in chain}
        if name not in surfs:
            continue
        for surf in surfs:
            if is_male_pronoun(surf, lang):
                male += 1
            elif is_female_pronoun(surf, lang):
                female += 1
    if male == female:
        return Gender.UNKNOWN
    return Gender.MALE if male > female else Gender.FEMALE


def _cut_shortest_paths(G: nx.Graph, a: str, b: str) -> None:
    """Remove the first edge of every shortest path between a and b
    (see module docstring: this is the reference's effective behavior)."""
    try:
        paths = list(nx.all_shortest_paths(G, source=a, target=b))
    except (nx.NetworkXNoPath, nx.NodeNotFound):
        return
    edges = {(p[0], p[1]) for p in paths if len(p) >= 2}
    G.remove_edges_from(edges)


def graph_rules_unify(
    tokens: list[str],
    entities: list[Entity],
    corefs: list[list[Span]] | None = None,
    lang: str = "eng",
    min_appearances: int = 0,
    link_corefs_mentions: bool = False,
    ignore_lone_titles: frozenset[str] | None = None,
    ignore_leading_determiner: bool = False,
    hypocorisms: HypocorismGazetteer | None = None,
    character_tag: str = "PER",
) -> list[Character]:
    gaz = hypocorisms or shared_gazetteer(lang if lang == "eng" else "eng")
    ignore_lone = ignore_lone_titles or frozenset()

    mentions = [
        _mention_from_entity(e, tokens) for e in entities if e.tag == character_tag
    ]
    names = sorted({m.surface for m in mentions if m.surface not in ignore_lone})

    def prep(name: str) -> str:
        if ignore_leading_determiner:
            return _strip_leading_determiner(name, lang)
        return name

    G: nx.Graph = nx.Graph()
    G.add_nodes_from(names)

    parsed = {n: parse_name(prep(n), lang) for n in names}

    # positive rules (``character_unification.py:242-282``)
    for n1, n2 in combinations(names, 2):
        p1, p2 = prep(n1), prep(n2)
        if gaz.are_related(p1, p2):
            G.add_edge(n1, n2)
            continue
        if _names_related_after_title_removal(p1, p2, lang, gaz):
            G.add_edge(n1, n2)
            continue
        h1, h2 = parsed[n1], parsed[n2]
        if h1.last and h1.last.lower() == h2.last.lower():
            G.add_edge(n1, n2)
            continue
        if h1.first and h1.first.lower() == h2.first.lower():
            G.add_edge(n1, n2)
            continue
        if corefs is not None and link_corefs_mentions:
            if _names_in_same_coref(n1, n2, corefs, tokens):
                G.add_edge(n1, n2)

    genders = {n: _infer_name_gender(n, corefs, tokens, lang) for n in names}

    # negative rules (``character_unification.py:299-327``)
    for n1, n2 in combinations(names, 2):
        h1, h2 = parsed[n1], parsed[n2]
        if (
            h1.last
            and h2.last
            and h1.first
            and h2.first
            and h1.last.lower() == h2.last.lower()
            and h1.first.lower() != h2.first.lower()
        ):
            _cut_shortest_paths(G, n1, n2)
            continue
        g1, g2 = genders[n1], genders[n2]
        if g1 != g2 and g1 != Gender.UNKNOWN and g2 != Gender.UNKNOWN:
            _cut_shortest_paths(G, n1, n2)

    # components -> characters with majority gender
    # (``character_unification.py:330-342``)
    characters: list[Character] = []
    for comp in sorted(nx.connected_components(G), key=lambda c: sorted(c)):
        comp_names = sorted(comp)
        counts = Counter(genders[n] for n in comp_names)
        gender = max(counts, key=lambda g: (counts[g], -int(g)))
        characters.append(
            Character(
                frozenset(comp_names),
                [m for m in mentions if m.surface in comp],
                gender,
            )
        )

    if corefs is not None:
        characters = assign_coreference_mentions(characters, corefs, tokens)

    # min-appearances over *named* mentions (``character_unification.py:349-355``)
    characters = [
        c
        for c in characters
        if sum(1 for m in c.mentions if m.surface in c.names) >= min_appearances
    ]
    return characters


def alias_edges(characters: list[Character]) -> list[tuple[str, str]]:
    """Intra-document alias links, for the cross-document
    canonicalization shuffle: consecutive pairs of each character's
    sorted name set (enough to reconstruct connectivity globally)."""
    edges = []
    for c in characters:
        ns = sorted(c.names)
        for a, b in zip(ns, ns[1:]):
            edges.append((a, b))
    return edges
