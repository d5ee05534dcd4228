"""Tree-mutation ops re-providing the lxml behaviors the reference
relies on: ``drop_tag`` (lxml.html), ``strip_tags`` (lxml.etree) and
tail-preserving removal (Parser.remove, parsers.py:192-207)."""
from __future__ import annotations

from .element import Element, is_element


def drop_tag(node: Element) -> None:
    """Remove the element but keep its children and text, merged into
    the parent at the element's position (lxml.html drop_tag)."""
    parent = node.getparent()
    if parent is None:
        return
    idx = parent.index(node)
    children = list(node)
    # leading inner text merges into predecessor text/tail
    if node.text:
        _prepend_text_at(parent, idx, node.text)
        idx = parent.index(node)
    for child in children:
        node.remove(child)
    # insert children at node position
    pos = idx
    for child in children:
        parent.insert(pos, child)
        pos += 1
    # node's tail attaches after last child (or merges like text)
    node_idx = parent.index(node)
    if node.tail:
        if children:
            last = children[-1]
            last.tail = (last.tail or "") + node.tail
        else:
            _prepend_text_at(parent, node_idx, node.tail)
    parent.remove(node)


def _prepend_text_at(parent: Element, idx: int, text: str) -> None:
    """Attach text so it renders just before child index ``idx``."""
    if idx == 0:
        parent.text = (parent.text or "") + text
    else:
        prev = parent[idx - 1]
        prev.tail = (prev.tail or "") + text


def strip_tags(root: Element, *tags) -> None:
    """lxml.etree.strip_tags: unwrap all descendant elements with the
    given tags (keep text/children), never the root itself."""
    tagset = set(tags)
    changed = True
    while changed:
        changed = False
        for node in list(root.iterdescendants()):
            if node.tag in tagset and node.getparent() is not None:
                drop_tag(node)
                changed = True


def drop_tree(node: Element) -> None:
    """lxml.html drop_tree: remove the element and its children but
    keep its tail, joined DIRECTLY (no inserted space — unlike the
    reference Parser's remove()) onto the previous sibling's tail or
    the parent's text. This is what lxml Cleaner's kill path uses, so
    article-HTML cleaning must splice tails this way or text after a
    killed <iframe>/<form>/<script> silently disappears."""
    parent = node.getparent()
    if parent is None:
        return
    if node.tail:
        prev = node.getprevious()
        if prev is None:
            parent.text = (parent.text or "") + node.tail
        else:
            prev.tail = (prev.tail or "") + node.tail
    node.clear()
    parent.remove(node)


def remove_keep_tail(node: Element) -> None:
    """The reference Parser's remove(): before detaching, splice the
    node's tail into the previous sibling (or parent text) with a
    leading space (parsers.py:192-207)."""
    parent = node.getparent()
    if parent is None:
        return
    if node.tail:
        prev = node.getprevious()
        if prev is None:
            if not parent.text:
                parent.text = ""
            parent.text += " " + node.tail
        else:
            if not prev.tail:
                prev.tail = ""
            prev.tail += " " + node.tail
    node.clear()
    parent.remove(node)
