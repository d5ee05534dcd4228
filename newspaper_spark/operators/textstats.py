"""Text analysis operators: language-ID, quality scoring, token
counting, rolling-hash fingerprints. All pure Column expressions —
JVM-side, whole-stage-codegen friendly, SQL-oracle-checkable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small high-frequency marker word lists per language (public knowledge,
# intentionally tiny: this is an n-gram/marker heuristic, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "la", "los", "las", "que", "para", "con", "una"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "est", "une", "pour", "dans", "avec"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def _tokens(text_col):
    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")


def lang_id_col(text_col):
    """argmax over marker-hit counts; ties broken by language code order
    (stable, portable to SQL)."""
    toks = _tokens(text_col)

    def hit_count(words):
        # closure factory: a default-arg lambda would make pyspark treat
        # the lambda as (element, index) and break
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [
        F.struct(
            hit_count(words).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # array_max on (score, lang) structs: max score, then max lang code —
    # mirror with ORDER BY score DESC, lang DESC LIMIT 1 in SQL
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_col(text_col):
    """Whitespace token count."""
    return F.size(_tokens(text_col))


def bpe_ish_token_count_col(text_col):
    """Sub-word-ish count: alnum runs and single punctuation marks, the
    usual pre-tokenizer regex."""
    return F.size(
        F.filter(
            F.split(text_col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.trim(t) != "",
        )
    )


def quality_score_col(text_col):
    """Boilerplate-ish quality heuristic in [0,1]: length band, alpha
    ratio, mean word length band, stopword presence."""
    n_chars = F.length(text_col)
    toks = _tokens(text_col)
    n_words = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^A-Za-zÀ-ÿ一-龥]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 100000), 1.0).otherwise(0.25)
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.25)
    stop_hits = F.size(
        F.filter(
            toks,
            lambda t: F.array_contains(
                F.array(*[F.lit(w) for w in ["the", "and", "is", "a", "of"]]), t
            ),
        )
    )
    stop_ok = F.when(stop_hits > 0, 1.0).otherwise(0.5)
    return F.round((alpha_ratio + len_ok + wlen_ok + stop_ok) / 4.0, 6)


def doc_fingerprint_col(text_col):
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "lang_id": lang_id_col(c),
            "n_tokens": token_count_col(c),
            "quality": quality_score_col(c),
            "fingerprint": doc_fingerprint_col(c),
        }
    )
