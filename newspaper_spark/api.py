"""Module-level API helpers — the reference's ``newspaper.api``
surface (api.py:45-68) re-expressed as DataFrame producers:

- ``popular_urls(spark)``: the reference reads a bundled
  popular-sources list and returns ``'http://' + line`` per entry
  (api.py:51-56). Here the same bundled list (a data resource, like
  the stopword tables) becomes a small DataFrame with the file order
  preserved as ``idx`` — at cluster scale this is the seed relation a
  crawl frontier starts from, so a relation (joinable, broadcastable)
  is the Spark-first shape rather than a Python list.
- ``languages(spark)``: the reference prints the supported-language
  table derived from the stopword files plus a code→name map
  (utils.py:343-402, api.py:45-48). Here: one row per 2-char stopword
  code in sorted order with its full name — the same derivation, from
  our bundled stopwords.json (the driver-verified 38-language set; the
  'nlp-en' summarization wordlist is not a language code and is
  excluded, matching the reference's *.txt filename parse).

Both are O(hundreds)-row dimension tables: created via
``spark.createDataFrame`` on the driver (bounded by construction) and
meant to be ``F.broadcast``-joined by consumers.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_RESOURCES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "resources")

# reference utils.py:357-396 — full names for every supported 2-char
# code; keyed identically so languages() covers exactly the stopword set
LANGUAGE_NAMES = {
    "ar": "Arabic",
    "be": "Belarusian",
    "bg": "Bulgarian",
    "da": "Danish",
    "de": "German",
    "el": "Greek",
    "en": "English",
    "es": "Spanish",
    "et": "Estonian",
    "fa": "Persian",
    "fi": "Finnish",
    "fr": "French",
    "he": "Hebrew",
    "hi": "Hindi",
    "hr": "Croatian",
    "hu": "Hungarian",
    "id": "Indonesian",
    "it": "Italian",
    "ja": "Japanese",
    "ko": "Korean",
    "lt": "Lithuanian",
    "mk": "Macedonian",
    "nb": "Norwegian (Bokmål)",
    "nl": "Dutch",
    "no": "Norwegian",
    "pl": "Polish",
    "pt": "Portuguese",
    "ro": "Romanian",
    "ru": "Russian",
    "sl": "Slovenian",
    "sr": "Serbian",
    "sv": "Swedish",
    "sw": "Swahili",
    "th": "Thai",
    "tr": "Turkish",
    "uk": "Ukrainian",
    "vi": "Vietnamese",
    "zh": "Chinese",
}


def popular_source_domains() -> list[str]:
    """The bundled popular-sources domain list, file order preserved."""
    with open(os.path.join(_RESOURCES, "popular_sources.json")) as f:
        return json.load(f)


def language_codes() -> list[str]:
    """Sorted 2-char codes derived from the bundled stopword tables —
    the reference's get_available_languages() (utils.py:343-352),
    which asserts every code is exactly 2 chars."""
    with open(os.path.join(_RESOURCES, "stopwords.json")) as f:
        codes = [k for k in json.load(f) if len(k) == 2]
    for c in codes:
        assert len(c) == 2
    return sorted(codes)


def popular_urls(spark: SparkSession) -> DataFrame:
    """newspaper.popular_urls() (api.py:51-56): 'http://' + each
    bundled domain, as (idx, url) with the file order preserved."""
    rows = [
        (i, "http://" + d) for i, d in enumerate(popular_source_domains())
    ]
    return spark.createDataFrame(rows, "idx int, url string")


def languages(spark: SparkSession) -> DataFrame:
    """newspaper.languages() (api.py:45-48): the supported-language
    table as (code, full_name), sorted by code."""
    rows = [(c, LANGUAGE_NAMES[c]) for c in language_codes()]
    return spark.createDataFrame(rows, "code string, full_name string")
