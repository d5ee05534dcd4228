"""Node finders covering the query surface the reference engine uses:

* ``find_by_tag``   — descendant[-or-self] tag search
  (Parser.getElementsByTag, parsers.py:110-128)
* ``find_by_tags``  — descendant multi-tag search (parsers.py:169-174)
* ``find_attr_contains`` — case-insensitive *substring* match on one
  attribute (the translate()+contains() xpath at parsers.py:121-122)
* ``find_attr_regex``    — case-insensitive regex search on one
  attribute (the EXSLT re:test path, parsers.py:117-119)
* ``css_select``    — the small CSS subset the reference passes to
  cssselect: tag, [attr], [attr=v], [attr~=v], [attr*=v], descendant
  combinator and comma groups.
* ``iter_comments`` — '//comment()' (parsers.py:184-186)

All results are in document order, matching xpath.
"""
from __future__ import annotations

import re
import string

from .element import Element, is_comment, is_element

_UPPER_TO_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)


def _iter_elements(root: Element, include_self: bool):
    it = root.iter()
    first = next(it, None)
    if first is not None:
        if include_self and is_element(first):
            yield first
    for node in it:
        if is_element(node):
            yield node


def find_by_tag(root, tag=None, attr=None, value=None, use_regex=False):
    """descendant-or-self search; mirrors getElementsByTag's quirk of
    dropping the root itself from results when a tag is given."""
    results = []
    include_self_in_scan = True
    for node in _iter_elements(root, include_self_in_scan):
        if tag is not None and node.tag != tag:
            continue
        if attr is not None and value is not None:
            av = node.attrib.get(attr)
            if av is None:
                continue
            if use_regex:
                if not re.search(value, av, re.IGNORECASE):
                    continue
            else:
                if value.lower() not in av.translate(_UPPER_TO_LOWER):
                    continue
        results.append(node)
    if root in results and tag is not None:
        results.remove(root)
    return results


def find_by_tags(root, tags) -> list:
    """descendant (not self) search over multiple tags, document order."""
    tagset = set(tags)
    star = "*" in tagset
    out = []
    for node in _iter_elements(root, include_self=False):
        if node is root:
            continue
        if star or node.tag in tagset:
            out.append(node)
    return out


def find_attr_regex(root, attr: str, pattern: str) -> list:
    rx = re.compile(pattern, re.IGNORECASE)
    out = []
    for node in _iter_elements(root, include_self=True):
        av = node.attrib.get(attr)
        if av is not None and rx.search(av):
            out.append(node)
    return out


def iter_comments(root) -> list:
    return [n for n in root.iter() if is_comment(n)]


def get_element_by_id(root, idd):
    for node in _iter_elements(root, include_self=True):
        if node.attrib.get("id") == idd:
            return node
    return None


# ---------------------------------------------------------------------------
# mini CSS
# ---------------------------------------------------------------------------

_SEL_ATTR_RE = re.compile(
    r"\[\s*([\w:-]+)\s*(?:([~*|^$]?=)\s*(\"[^\"]*\"|'[^']*'|[^\]\s]+))?\s*\]"
)


class _Simple:
    __slots__ = ("tag", "conds")

    def __init__(self, tag, conds):
        self.tag = tag
        self.conds = conds  # list of (attr, op, value)

    def matches(self, node: Element) -> bool:
        if not is_element(node):
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        for attr, op, value in self.conds:
            av = node.attrib.get(attr)
            if av is None:
                return False
            if op is None:
                continue
            if op == "=":
                if av != value:
                    return False
            elif op == "~=":
                if value not in av.split():
                    return False
            elif op == "*=":
                if value not in av:
                    return False
            elif op == "^=":
                if not av.startswith(value):
                    return False
            elif op == "$=":
                if not av.endswith(value):
                    return False
            else:
                return False
        return True


def _parse_simple(token: str) -> _Simple:
    conds = []
    def grab(m):
        val = m.group(3)
        if val is not None and val[:1] in "\"'":
            val = val[1:-1]
        conds.append((m.group(1), m.group(2), val))
        return ""
    tag = _SEL_ATTR_RE.sub(grab, token).strip()
    return _Simple(tag or None, conds)


def _parse_selector(selector: str):
    """Returns a list of compound selectors (each a list of _Simple with
    implicit descendant combinators)."""
    groups = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            continue
        chain = [_parse_simple(tok) for tok in part.split()]
        groups.append(chain)
    return groups


def css_select(root: Element, selector: str) -> list:
    groups = _parse_selector(selector)
    out = []
    seen = set()
    for node in _iter_elements(root, include_self=True):
        for chain in groups:
            if _match_chain(node, chain, root):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
                break
    return out


def _match_chain(node: Element, chain, root: Element) -> bool:
    if not chain[-1].matches(node):
        return False
    # walk ancestors (up to and including root) for the remaining parts
    idx = len(chain) - 2
    anc = node.getparent()
    while idx >= 0:
        found = False
        while anc is not None:
            stop_after = anc is root
            if chain[idx].matches(anc):
                found = True
                anc = anc.getparent()
                break
            if stop_after:
                anc = None
                break
            anc = anc.getparent()
        if not found:
            return False
        idx -= 1
    return True
