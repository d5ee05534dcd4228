"""HTML serialization compatible with ``lxml.etree.tostring(method='html')``
as used by Parser.nodeToString/outerHtml (parsers.py:87-92, 257-263)."""
from __future__ import annotations

from .element import Element, is_comment

_VOID = frozenset(
    "area base basefont br col command embed frame hr img input isindex "
    "keygen link meta param source track wbr".split()
)

# rawtext elements: contents not escaped in html serialization
_RAWTEXT = frozenset(["script", "style"])


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def node_to_html(node: Element, with_tail: bool = True) -> str:
    out: list[str] = []
    _serialize(node, out)
    if with_tail and node.tail:
        out.append(_escape_text(node.tail))
    return "".join(out)


def _serialize(node: Element, out: list) -> None:
    if is_comment(node):
        out.append(f"<!--{node.text or ''}-->")
        return
    tag = node.tag
    out.append("<" + tag)
    for k, v in node.attrib.items():
        out.append(f' {k}="{_escape_attr(v if v is not None else "")}"')
    out.append(">")
    if tag in _VOID:
        return
    raw = tag in _RAWTEXT
    if node.text:
        out.append(node.text if raw else _escape_text(node.text))
    for child in node:
        _serialize(child, out)
        if child.tail:
            out.append(_escape_text(child.tail))
    out.append(f"</{tag}>")


def outer_html(node: Element) -> str:
    """outerHtml: serialize without the tail (parsers.py:257-263)."""
    return node_to_html(node, with_tail=False)
