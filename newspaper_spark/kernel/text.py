"""Tokenization + stopword statistics.

Re-implements the reference's word model (text.py:16-101): innerTrim,
punctuation-stripped whitespace tokens, per-language stopword counts.
Stopword lists ship as one bundled JSON (data resource) so executors
need no filesystem layout; they are loaded once per Python worker and
kept in a module-level cache (broadcast-equivalent: small, read-only).

Languages whose reference tokenizers need unavailable third-party
packages (zh=jieba, ja=tinysegmenter, th=pythainlp, ar/fa=nltk ISRI)
get deterministic stdlib fallbacks with the same *shape* (per-character
or word-punct segmentation); counts differ slightly from the reference
for those languages only.
"""
from __future__ import annotations

import json
import os
import re
import string
from functools import lru_cache

_TABSSPACE = re.compile(r"[\s\t]+")
_PUNCT_TABLE = {ord(c): None for c in string.punctuation}

_RESOURCE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "stopwords.json",
)

_STOPWORDS_ALL: dict[str, frozenset] | None = None


_WS_NOT_SPACE = re.compile(r"[^\S ]")


def inner_trim(value) -> str:
    """Collapse whitespace runs to single spaces, join lines, strip
    (text.py:19-25)."""
    if isinstance(value, str):
        # fast path (the overwhelmingly common case in the scorer's
        # per-node calls): no whitespace runs and no non-space
        # whitespace ⇒ sub+splitlines are identity, only strip applies
        if "  " not in value and _WS_NOT_SPACE.search(value) is None:
            return value.strip()
        value = _TABSSPACE.sub(" ", value)
        value = "".join(value.splitlines())
        return value.strip()
    return ""


def _load_all() -> dict:
    global _STOPWORDS_ALL
    if _STOPWORDS_ALL is None:
        raw = None
        try:
            with open(_RESOURCE_PATH, encoding="utf-8") as f:
                raw = json.load(f)
        except OSError:
            # zip-deployed (spark-submit --py-files): read via the
            # import machinery instead of the filesystem
            from importlib import resources

            raw = json.loads(
                resources.files("newspaper_spark.resources")
                .joinpath("stopwords.json")
                .read_text(encoding="utf-8")
            )
        _STOPWORDS_ALL = {lang: frozenset(words) for lang, words in raw.items()}
    return _STOPWORDS_ALL


@lru_cache(maxsize=64)
def stopword_set(language: str) -> frozenset:
    all_sets = _load_all()
    if language in all_sets:
        return all_sets[language]
    return all_sets.get("en", frozenset())


def nlp_stopword_set(language: str) -> frozenset:
    """nlp.py:22-37 — English keyword extraction uses a dedicated list."""
    if language == "en":
        return _load_all().get("nlp-en", frozenset())
    return stopword_set(language)


class WordStats:
    __slots__ = ("stop_word_count", "word_count", "stop_words")

    def __init__(self, stop_word_count=0, word_count=0, stop_words=()):
        self.stop_word_count = stop_word_count
        self.word_count = word_count
        self.stop_words = list(stop_words)


def remove_punctuation(content: str) -> str:
    return content.translate(_PUNCT_TABLE)


def _wordpunct(content: str) -> list:
    # nltk.wordpunct_tokenize equivalent: \w+|[^\w\s]+
    return re.findall(r"\w+|[^\w\s]+", content, re.UNICODE)


def _char_segment(content: str) -> list:
    # fallback for zh/ja/th segmenters: one token per non-space char,
    # keeping latin runs together
    return re.findall(r"[A-Za-z0-9]+|\S", content)


def candidate_words(stripped: str, language: str) -> list:
    if language in ("zh", "ja", "th"):
        return _char_segment(stripped)
    if language in ("ar", "fa"):
        return _wordpunct(stripped)
    return stripped.split(" ")


def stopword_stats(content: str, language: str = "en") -> WordStats:
    """StopWords.get_stopword_count (text.py:85-101) with the language
    dispatch of configuration.py:105-121 folded in.

    Results are memoized by (content, language): article boilerplate
    (nav/footer strings, repeated paragraph leads) recurs across nodes
    and pages, and the scorer re-asks for the same strings thousands of
    times per batch. Callers treat WordStats as immutable (the only
    consumer reads .stop_word_count), so sharing cached instances is
    safe. CPython caches str hashes, so repeat keys are O(1)."""
    return _stopword_stats_cached(content, language)


@lru_cache(maxsize=8192)
def _stopword_stats_cached(content: str, language: str) -> WordStats:
    if not content:
        return WordStats()
    lang_key = "ar" if language == "fa" else language
    stops = stopword_set(lang_key)
    if language == "th":
        # pythainlp segmentation is unavailable; Thai is unspaced, so a
        # per-character fallback finds no multi-char stopwords. Proxy:
        # count stopword SUBSTRING occurrences (the scorer only consumes
        # counts vs thresholds).
        stripped = remove_punctuation(content)
        overlapping = [s for s in stops if s and s in stripped]
        return WordStats(len(overlapping), max(len(stripped), 1), overlapping)
    if language in ("ar", "fa"):
        # StopWordsArabic keeps punctuation (text.py:124-125)
        cands = candidate_words(content.lower(), language)
    elif language == "hi":
        # StopWordsHindi degenerately counts every stopword per word
        # (text.py:168-184)
        stripped = remove_punctuation(content)
        cands = stripped.split(" ")
        overlapping = [s for _w in cands for s in stops]
        return WordStats(len(overlapping), len(cands), overlapping)
    elif language == "ko":
        stripped = remove_punctuation(content)
        cands = stripped.split(" ")
        overlapping = [w for w in cands for s in stops if w.endswith(s)]
        return WordStats(len(overlapping), len(cands), overlapping)
    else:
        stripped = remove_punctuation(content)
        cands = candidate_words(stripped.lower(), language)
    overlapping = [w for w in cands if w in stops]
    return WordStats(len(overlapping), len(cands), overlapping)
