"""Top-node → article text.

Re-expression of /root/reference/newspaper/outputformatters.py:41-175:
drop negative-gravity subtrees, strip <a>, literal-``\\n`` injection for
<br>/<li> (the two-character string, later split on — replicated
verbatim, see SURVEY.md §7 hard parts), strip inline tags, drop empty
tags in reverse document order, drop a trailing deep media div, then
per-child text extraction with unescape + innerTrim.
"""
from __future__ import annotations

from html import unescape

from ..dom import (
    Element,
    css_select,
    find_by_tag,
    find_by_tags,
    remove_keep_tail,
    strip_tags,
)
from .text import inner_trim

_LITERAL_NL = r"\n"  # two characters: backslash + n


def get_text(node: Element) -> str:
    parts: list = []
    node._gather_text(parts)
    return inner_trim(" ".join(parts).strip())


def get_formatted_text(top_node: Element) -> str:
    remove_negativescores_nodes(top_node)
    links_to_text(top_node)
    add_newline_to_br(top_node)
    add_newline_to_li(top_node)
    replace_with_text(top_node)
    remove_empty_tags(top_node)
    remove_trailing_media_div(top_node)
    return convert_to_text(top_node)


def convert_to_text(top_node: Element) -> str:
    txts = []
    for node in list(top_node):
        try:
            txt = get_text(node)
        except ValueError:
            txt = None
        if txt:
            txt = unescape(txt)
            txt_lis = inner_trim(txt).split(_LITERAL_NL)
            txt_lis = [n.strip(" ") for n in txt_lis]
            txts.extend(txt_lis)
    return "\n\n".join(txts)


def add_newline_to_br(top_node: Element) -> None:
    for e in find_by_tag(top_node, tag="br"):
        e.text = _LITERAL_NL


def add_newline_to_li(top_node: Element) -> None:
    for e in find_by_tag(top_node, tag="ul"):
        li_list = find_by_tag(e, tag="li")
        for li in li_list[:-1]:
            li.text = get_text(li) + _LITERAL_NL
            for c in list(li):
                remove_keep_tail(c)


def links_to_text(top_node: Element) -> None:
    strip_tags(top_node, "a")


def remove_negativescores_nodes(top_node: Element) -> None:
    for item in css_select(top_node, "*[gravityScore]"):
        score = item.attrib.get("gravityScore")
        score = float(score) if score else 0
        if score < 1:
            parent = item.getparent()
            if parent is not None:
                parent.remove(item)


def replace_with_text(top_node: Element) -> None:
    strip_tags(top_node, "b", "strong", "i", "br", "sup")


def remove_empty_tags(top_node: Element) -> None:
    all_nodes = find_by_tags(top_node, ["*"])
    all_nodes.reverse()
    for el in all_nodes:
        tag = el.tag
        text = get_text(el)
        if (
            (tag != "br" or text != "\\r")
            and not text
            and len(find_by_tags(el, ("object", "embed"))) == 0
        ):
            remove_keep_tail(el)


def remove_trailing_media_div(top_node: Element) -> None:
    NON_MEDIA_CLASSES = ("zn-body__read-all",)

    def get_depth(node, depth=1):
        children = list(node)
        if not children:
            return depth
        max_depth = 0
        for c in children:
            e_depth = get_depth(c, depth + 1)
            if e_depth > max_depth:
                max_depth = e_depth
        return max_depth

    top_level_nodes = list(top_node)
    if len(top_level_nodes) < 3:
        return
    last_node = top_level_nodes[-1]
    if last_node.attrib.get("class") in NON_MEDIA_CLASSES:
        return
    if get_depth(last_node) >= 2:
        remove_keep_tail(last_node)
