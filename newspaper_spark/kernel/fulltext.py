"""The stateless extraction kernel: html → main text.

Mirrors ``newspaper.fulltext`` (api.py:71-93), the contract for
per-turn text equality: parse → clean → best-node → post_cleanup →
format. Pure Python; invoked per row inside Arrow batches by the Spark
operators layer.
"""
from __future__ import annotations

from ..dom import fromstring
from .cleaner import clean_document
from .formatter import get_formatted_text
from .scorer import calculate_best_node, post_cleanup


def fulltext(html: str, language: str = "en") -> str:
    doc = fromstring(html)
    if doc is None:
        return ""
    doc = clean_document(doc)
    top_node = calculate_best_node(doc, language)
    if top_node is None:
        return ""
    top_node = post_cleanup(top_node, language)
    return get_formatted_text(top_node)
