"""C4's page-level heuristic filters (Raffel et al. 2020, §2.2) as a
single map-only Column stage: each rule is exposed as its own flag so
downstream jobs can attribute WHY a page was dropped (the standard
requirement for auditing a training-data pipeline), plus the combined
``keep`` verdict.

Rules implemented (page-level ones; the line-level terminal-punctuation
rule lives with span/line processing in span_dedup.py's sentence
machinery):

* ``has_curly``        — page contains ``{`` (code, not prose)
* ``has_lorem``        — page contains "lorem ipsum" (placeholder text)
* ``has_javascript``   — page mentions "javascript" (script warnings)
* ``enough_sentences`` — ≥ 5 period-delimited sentences
* ``enough_words``     — ≥ 3 whitespace tokens

All Column work, zero shuffles, zero UDFs — map-only at scan
granularity. One caveat to the codegen story: the sentence count uses
one Catalyst higher-order ``filter`` lambda, which is interpreted per
ELEMENT (see CLAUDE.md) — but its element count is period-segments per
page (tens), not characters, so the interpreted cost is bounded and
smaller than an extra regex pass over the full text would be.
Everything is exactly reproducible in the SQL oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import token_count_col


def c4_filters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    # null text behaves like empty text: definite false/0 flags, never
    # null verdicts
    c = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(c)
    n_sentences = F.size(
        F.filter(F.split(c, r"\."), lambda s: F.trim(s) != "")
    )
    # the ONE whitespace-token-count spelling (textstats._tokens) —
    # never re-spell it, or the oracles drift
    n_words = token_count_col(c)
    has_curly = c.contains("{")
    has_lorem = lower.contains("lorem ipsum")
    has_javascript = lower.contains("javascript")
    enough_sentences = n_sentences >= 5
    enough_words = n_words >= 3
    return df.select(
        F.col(id_col),
        has_curly.alias("has_curly"),
        has_lorem.alias("has_lorem"),
        has_javascript.alias("has_javascript"),
        n_sentences.cast("long").alias("n_sentences"),
        enough_sentences.alias("enough_sentences"),
        n_words.cast("long").alias("n_words"),
        enough_words.alias("enough_words"),
        (
            ~has_curly
            & ~has_lorem
            & ~has_javascript
            & enough_sentences
            & enough_words
        ).alias("keep"),
    )
