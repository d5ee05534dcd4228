"""Charset decoding for binary HTML payloads.

The transcripts input carries decoded strings (input_hint), but raw
crawl tables carry bytes; this is the UnicodeDammit stage
(parsers.py:46-57) re-expressed without bs4: BOM sniff → declared
charset (meta/xml decl) → utf-8 strict → cp1252 fallback (the superset
that never fails). Vectorized over Arrow batches.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)"""
    rb"""|<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def decode_html_bytes(raw: bytes) -> str:
    if raw is None:
        return None
    if isinstance(raw, str):
        return raw
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            try:
                return raw.decode(enc)
            except (UnicodeDecodeError, LookupError):
                break
    m = _CHARSET_RE.search(raw[:4096])
    if m:
        enc = (m.group(1) or m.group(2)).decode("ascii", "ignore")
        try:
            return raw.decode(enc)
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("cp1252", "replace")


def _decode_batch(payloads: pd.Series) -> pd.Series:
    return pd.Series([decode_html_bytes(p) for p in payloads], dtype="object")


decode_html_udf = F.pandas_udf(_decode_batch, T.StringType())


def decode_html(df: DataFrame, binary_col: str, out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col, decode_html_udf(F.col(binary_col)))
