"""Vendored rule-based English noun lemmatizer (T3 parity path).

The reference lemmatizes tokens with NLTK's WordNetLemmatizer using the
default pos='n' (``data_loader/base_dataset_loader.py:89``), i.e. NOUN
morphy only. NLTK (and its WordNet corpus) is not available in every
deployment — and executors must never download corpora at import time —
so this module vendors a dependency-free approximation:

- the common irregular-plural entries of WordNet's public noun exception
  list (``noun.exc``; WordNet data carries Princeton's permissive
  license) as an explicit dict;
- WordNet morphy's noun MORPHOLOGICAL_SUBSTITUTIONS re-expressed as
  ordered first-match rules;
- a curated keep-set + keep-suffixes standing in for morphy's
  "is-the-form-already-a-WordNet-lemma" vocabulary check (the full
  117k-lemma index is what we deliberately do not vendor).

DOCUMENTED DIVERGENCE from true WordNetLemmatizer (pos='n'):
- morphy validates every candidate against the full WordNet lemma
  index; we approximate that check with the keep-set/suffix heuristics,
  so singular s-final nouns outside the curated set (e.g. rare words
  like "alms") may be wrongly stripped, and -ses plurals whose stem
  needs vocabulary disambiguation ("houses" → "house" vs "buses" →
  "bus") follow the rules below rather than an index lookup;
- morphy returns the SHORTEST validated candidate; with no index we
  return the first rule hit.
The golden-file test (tests/test_lemmatizer.py) pins the exact expected
output — including WordNet quirks we reproduce deliberately, like
"heroes" staying unchanged (morphy has no -oes rule and fails to find a
form, so WordNetLemmatizer returns the input verbatim).
"""

from __future__ import annotations

# Subset of WordNet's noun.exc irregular plurals (Princeton WordNet
# public data). Keys are inflected forms, values the lemma.
NOUN_EXCEPTIONS: dict[str, str] = {
    "analyses": "analysis",
    "appendices": "appendix",
    "axes": "axis",
    "bases": "basis",
    "children": "child",
    "corpora": "corpus",
    "crises": "crisis",
    "criteria": "criterion",
    "data": "datum",
    "diagnoses": "diagnosis",
    "feet": "foot",
    "geese": "goose",
    "halves": "half",
    "hypotheses": "hypothesis",
    "indices": "index",
    "knives": "knife",
    "leaves": "leaf",
    "lives": "life",
    "matrices": "matrix",
    "media": "medium",
    "men": "man",
    "mice": "mouse",
    "oxen": "ox",
    "parentheses": "parenthesis",
    "people": "people",
    "phenomena": "phenomenon",
    "selves": "self",
    "series": "series",
    "species": "species",
    "syntheses": "synthesis",
    "teeth": "tooth",
    "theses": "thesis",
    "vertices": "vertex",
    "wives": "wife",
    "wolves": "wolf",
    "women": "woman",
}

# Singular forms the suffix rules would wrongly strip — stands in for
# morphy's vocabulary check on the original form.
KEEP_WORDS: frozenset[str] = frozenset(
    {
        "alias", "amen", "atlas", "bias", "bonus", "bus", "campus",
        "canvas", "census", "chaos", "circus", "consensus", "corpus",
        "cosmos", "focus", "gas", "genius", "lens", "news", "omen",
        "semen", "status", "summons", "surplus", "virus", "yes",
    }
)

# Suffixes whose bearers are (almost) always already singular.
KEEP_SUFFIXES: tuple[str, ...] = ("ss", "us", "is", "ics")


def lemmatize_noun(word: str) -> str:
    """Best-effort WordNet-noun-style lemmatization of one lowercase
    token. Pure function, no I/O, no external data."""
    if not word:
        return word
    if word in NOUN_EXCEPTIONS:
        return NOUN_EXCEPTIONS[word]
    if word in KEEP_WORDS or not word.endswith("s"):
        # morphy also rescues non-s plurals like "men" via exceptions;
        # anything else without a final 's' is returned unchanged
        # (matching WordNetLemmatizer on forms it cannot analyze).
        if word.endswith("men") and len(word) > 3 and word not in KEEP_WORDS:
            return word[:-3] + "man"
        return word
    if any(word.endswith(s) for s in KEEP_SUFFIXES):
        return word
    # -es plural of a keep-word stem ("buses" → "bus", "gases" → "gas")
    if word.endswith("es") and word[:-2] in KEEP_WORDS:
        return word[:-2]
    # ordered first-match suffix rules (morphy's noun substitutions)
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        # short forms ("ties", "pies") are s-plurals of -ie nouns;
        # longer ones are -y plurals ("cities" → "city")
        return word[:-3] + "y" if len(word) > 4 else word[:-1]
    if word.endswith("ches") or word.endswith("shes"):
        return word[:-2]
    if word.endswith("xes") or word.endswith("zes"):
        return word[:-2]
    if word.endswith("ves"):
        return word[:-3] + "f"
    if word.endswith("oes"):
        # morphy has no -oes rule: WordNetLemmatizer returns the input
        # unchanged for "heroes"/"potatoes" — reproduce that quirk
        return word
    return word[:-1]


def lemmatize_tokens(tokens: list[str] | None) -> list[str] | None:
    if tokens is None:
        return None
    return [lemmatize_noun(t) for t in tokens]
