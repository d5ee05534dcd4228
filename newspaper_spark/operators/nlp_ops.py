"""NLP operators: keyword extraction and extractive summary as
Arrow-vectorized stages (Article.nlp equivalent, article.py:372-388)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _keywords_batch(texts, langs):
    from ..kernel.nlp import keywords

    out = []
    for text, lang in zip(texts, langs):
        try:
            out.append(sorted(keywords(text or "", lang or "en").keys()))
        except Exception:
            out.append([])
    return pd.Series(out, dtype="object")


def _summary_batch(titles, texts, langs):
    from ..kernel.nlp import summarize

    out = []
    for title, text, lang in zip(titles, texts, langs):
        try:
            out.append(
                summarize(title=title or "", text=text or "", max_sents=5,
                          language=lang or "en")[:5000]
            )
        except Exception:
            out.append("")
    return pd.Series(out, dtype="object")


keywords_udf = F.pandas_udf(_keywords_batch, T.ArrayType(T.StringType()))
summary_udf = F.pandas_udf(_summary_batch, T.StringType())


def add_nlp(df: DataFrame, title_col="title", text_col="text", lang="en") -> DataFrame:
    lang_col = F.lit(lang)
    return df.withColumns(
        {
            "keywords": keywords_udf(F.col(text_col), lang_col),
            "summary": summary_udf(F.col(title_col), F.col(text_col), lang_col),
        }
    )
