"""Small closed-class lexicons used by the per-document kernels.

Capability parity with the reference's resource tables
(``renard/resources/{pronouns,titles,determiners}``, see those modules'
semantics at ``renard/resources/pronouns/pronouns.py:3-10``,
``titles/titles.py:1-12``, ``determiners/determiners.py:1-41``); the word
lists themselves are common English/French closed-class vocabulary.

All sets are lowercase; callers lowercase before membership tests.
"""

from __future__ import annotations

from enum import IntEnum


class Gender(IntEnum):
    """Entity gender (reference analog: ``renard/gender.py:4-8``).

    IntEnum so it round-trips through Arrow int8 columns.
    """

    MALE = 0
    FEMALE = 1
    OTHER = 2
    UNKNOWN = 3


MALE_PRONOUNS: dict[str, frozenset[str]] = {
    "eng": frozenset({"he", "him", "his", "himself"}),
    "fra": frozenset({"il", "son", "lui-même"}),
}

FEMALE_PRONOUNS: dict[str, frozenset[str]] = {
    "eng": frozenset({"she", "her", "hers", "herself"}),
    "fra": frozenset({"elle", "sa", "elle-même"}),
}

MALE_TITLES: dict[str, frozenset[str]] = {
    "eng": frozenset({"mr.", "mr", "mister", "m.", "m", "sir", "lord"}),
    "fra": frozenset(
        {"monsieur", "mr", "mr.", "seigneur", "duc", "comte", "m", "m.", "sire"}
    ),
}

FEMALE_TITLES: dict[str, frozenset[str]] = {
    "eng": frozenset({"miss", "mrs.", "mrs", "lady"}),
    "fra": frozenset({"madame", "mademoiselle", "dame", "mme", "mlle"}),
}

ALL_TITLES: dict[str, frozenset[str]] = {
    lang: MALE_TITLES[lang] | FEMALE_TITLES[lang] for lang in MALE_TITLES
}

SINGULAR_DETERMINERS: dict[str, frozenset[str]] = {
    "eng": frozenset(
        {
            "a",
            "some",
            "the",
            "his",
            "her",
            "my",
            "their",
            "this",
            "that",
            "its",
            "our",
            "your",
            "such",
        }
    ),
    "fra": frozenset(
        {
            "le",
            "la",
            "les",
            "un",
            "une",
            "du",
            "de",
            "de la",
            "ce",
            "cette",
            "mon",
            "ma",
            "ton",
            "ta",
            "son",
            "sa",
            "notre",
            "votre",
            "leur",
            "au",
            "à",
            "l '",
        }
    ),
}


def is_male_pronoun(word: str, lang: str = "eng") -> bool:
    return word.lower() in MALE_PRONOUNS.get(lang, frozenset())


def is_female_pronoun(word: str, lang: str = "eng") -> bool:
    return word.lower() in FEMALE_PRONOUNS.get(lang, frozenset())


def is_male_title(title: str, lang: str = "eng") -> bool:
    return title.lower() in MALE_TITLES.get(lang, frozenset())


def is_female_title(title: str, lang: str = "eng") -> bool:
    return title.lower() in FEMALE_TITLES.get(lang, frozenset())


# Sentiment lexicon for the rule-based polarity stage (VADER-style compound
# score; reference analog: ``renard/pipeline/sentiment_analysis.py:7-39``).
POSITIVE_WORDS: frozenset[str] = frozenset(
    {
        "admirable",
        "admired",
        "adored",
        "agreeable",
        "amiable",
        "beautiful",
        "blessed",
        "brilliant",
        "charmed",
        "charming",
        "cheerful",
        "delighted",
        "delightful",
        "eager",
        "elegant",
        "excellent",
        "fond",
        "fortunate",
        "friendly",
        "generous",
        "gentle",
        "glad",
        "good",
        "graceful",
        "gracious",
        "grand",
        "happy",
        "handsome",
        "joy",
        "joyful",
        "kind",
        "laughed",
        "lively",
        "love",
        "loved",
        "lovely",
        "loves",
        "merry",
        "noble",
        "pleasant",
        "pleased",
        "pleasure",
        "pretty",
        "proud",
        "smiled",
        "splendid",
        "sweet",
        "warm",
        "wonderful",
    }
)

NEGATIVE_WORDS: frozenset[str] = frozenset(
    {
        "afraid",
        "angry",
        "anguish",
        "annoyed",
        "ashamed",
        "awful",
        "bad",
        "bitter",
        "cold",
        "cried",
        "cruel",
        "despised",
        "detested",
        "disagreeable",
        "disappointed",
        "disgust",
        "dreadful",
        "dull",
        "enemy",
        "evil",
        "fear",
        "feared",
        "foolish",
        "frightened",
        "furious",
        "grief",
        "hate",
        "hated",
        "hates",
        "horrible",
        "hurt",
        "jealous",
        "miserable",
        "offended",
        "pain",
        "poor",
        "quarrel",
        "resented",
        "sad",
        "scorn",
        "shame",
        "sorrow",
        "sorry",
        "terrible",
        "unhappy",
        "vexed",
        "vile",
        "wicked",
        "wretched",
        "wrong",
    }
)

# Common-word stoplist for the rule NER (sentence-initial capitalized words
# that are ordinary vocabulary shouldn't become PER mentions) and for the
# text-quality operators.
STOPWORDS: frozenset[str] = frozenset(
    {
        "a",
        "about",
        "after",
        "again",
        "all",
        "also",
        "an",
        "and",
        "any",
        "as",
        "at",
        "be",
        "because",
        "been",
        "before",
        "but",
        "by",
        "can",
        "could",
        "did",
        "do",
        "does",
        "down",
        "each",
        "few",
        "for",
        "from",
        "had",
        "has",
        "have",
        "he",
        "her",
        "here",
        "hers",
        "him",
        "his",
        "how",
        "i",
        "if",
        "in",
        "into",
        "is",
        "it",
        "its",
        "just",
        "may",
        "me",
        "might",
        "more",
        "most",
        "must",
        "my",
        "no",
        "nor",
        "not",
        "now",
        "of",
        "off",
        "on",
        "once",
        "one",
        "only",
        "or",
        "other",
        "our",
        "out",
        "over",
        "own",
        "said",
        "same",
        "she",
        "should",
        "so",
        "some",
        "such",
        "than",
        "that",
        "the",
        "their",
        "them",
        "then",
        "there",
        "these",
        "they",
        "this",
        "those",
        "through",
        "to",
        "too",
        "under",
        "until",
        "up",
        "very",
        "was",
        "we",
        "were",
        "what",
        "when",
        "where",
        "which",
        "while",
        "who",
        "whom",
        "why",
        "will",
        "with",
        "would",
        "you",
        "your",
    }
)
