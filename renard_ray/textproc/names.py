"""Minimal person-name parser (title / first / middle / last).

Stands in for the ``nameparser.HumanName`` dependency the reference
uses inside ``GraphRulesCharacterUnifier``
(``renard/pipeline/character_unification.py:262-276,380-396``); only the
fields those rules consume are implemented:

- leading title tokens (from the language's title lexicon),
- ``first`` / ``middle`` / ``last``,
- ``without_title`` = "{first} {middle} {last}" (the reference's
  title-removal reformat, ``character_unification.py:384-388``).

Parse convention (matches nameparser's common cases):
- 1 non-title token, no title     -> first
- 1 non-title token, with a title -> last  ("Mr. Darcy" -> last=Darcy)
- >=2 non-title tokens            -> first ... middle ... last
"""

from __future__ import annotations

from dataclasses import dataclass

from renard_ray.resources.lexicons import (
    ALL_TITLES,
    is_female_title,
    is_male_title,
)


@dataclass(frozen=True)
class ParsedName:
    title: str
    first: str
    middle: str
    last: str

    @property
    def without_title(self) -> str:
        return " ".join(p for p in (self.first, self.middle, self.last) if p)


from functools import lru_cache


@lru_cache(maxsize=65536)
def parse_name(name: str, lang: str = "eng") -> ParsedName:
    titles = ALL_TITLES.get(lang, frozenset())
    parts = name.split()
    i = 0
    title_parts: list[str] = []
    while i < len(parts) and parts[i].lower() in titles:
        title_parts.append(parts[i])
        i += 1
    rest = parts[i:]
    title = " ".join(title_parts)
    if not rest:
        return ParsedName(title, "", "", "")
    if len(rest) == 1:
        if title:
            return ParsedName(title, "", "", rest[0])
        return ParsedName(title, rest[0], "", "")
    return ParsedName(title, rest[0], " ".join(rest[1:-1]), rest[-1])


def title_gender(title: str, lang: str = "eng") -> int:
    """0=male, 1=female, 3=unknown (Gender enum values)."""
    from renard_ray.resources.lexicons import Gender

    first = title.split()[0] if title else ""
    if first and is_male_title(first, lang):
        return Gender.MALE
    if first and is_female_title(first, lang):
        return Gender.FEMALE
    return Gender.UNKNOWN
