"""Minimal DOM with lxml-style ``text``/``tail`` semantics.

Pure stdlib: this engine runs on Spark executors where only the Python
standard library plus pandas/pyarrow are guaranteed, so the HTML object
model newspaper gets from lxml (see /root/reference/newspaper/parsers.py)
is re-provided here from scratch: elements hold ``text`` (leading inner
text) and ``tail`` (text following the end tag), children are ordered,
and comments are first-class nodes whose ``tail`` participates in text
extraction while their own content does not (lxml ``itertext`` parity).
"""
from __future__ import annotations


class _CommentTag:
    """Sentinel tag for comment nodes (lxml uses a callable; any
    non-string works: ``node.tag == 'p'`` must be False)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<Comment>"


COMMENT = _CommentTag()


class Element:
    __slots__ = ("tag", "attrib", "text", "tail", "_children", "_parent")

    def __init__(self, tag="div", attrib=None, text=None, tail=None):
        self.tag = tag
        self.attrib = dict(attrib) if attrib else {}
        self.text = text
        self.tail = tail
        self._children: list[Element] = []
        self._parent: Element | None = None

    # --- structure -------------------------------------------------
    def __len__(self):
        return len(self._children)

    def __iter__(self):
        return iter(self._children)

    def __getitem__(self, i):
        return self._children[i]

    def __bool__(self):  # element truthiness is presence, like lxml warns about
        return True

    def append(self, child: "Element") -> None:
        if child._parent is not None:
            child._parent._children.remove(child)
        child._parent = self
        self._children.append(child)

    def insert(self, index: int, child: "Element") -> None:
        if child._parent is not None:
            child._parent._children.remove(child)
        child._parent = self
        self._children.insert(index, child)

    def remove(self, child: "Element") -> None:
        """Plain structural removal (lxml ``parent.remove``): the child's
        tail goes with it."""
        self._children.remove(child)
        child._parent = None

    def index(self, child: "Element") -> int:
        return self._children.index(child)

    def clear(self) -> None:
        for c in self._children:
            c._parent = None
        self._children = []
        self.text = None
        # lxml's clear() also drops attributes and tail
        self.attrib = {}
        self.tail = None

    def getparent(self):
        return self._parent

    def getprevious(self):
        p = self._parent
        if p is None:
            return None
        i = p._children.index(self)
        return p._children[i - 1] if i > 0 else None

    def getnext(self):
        p = self._parent
        if p is None:
            return None
        i = p._children.index(self)
        return p._children[i + 1] if i + 1 < len(p._children) else None

    def itersiblings(self, preceding: bool = False):
        p = self._parent
        if p is None:
            return
        i = p._children.index(self)
        if preceding:
            for j in range(i - 1, -1, -1):
                yield p._children[j]
        else:
            for j in range(i + 1, len(p._children)):
                yield p._children[j]

    # --- attributes ------------------------------------------------
    def get(self, key, default=None):
        return self.attrib.get(key, default)

    def set(self, key, value):
        self.attrib[key] = value

    # --- traversal -------------------------------------------------
    def iter(self, tag=None):
        """Document-order traversal of self + all descendants
        (including comments, like lxml's ``iter()``)."""
        stack = [self]
        while stack:
            node = stack.pop()
            if tag is None or node.tag == tag:
                yield node
            stack.extend(reversed(node._children))

    def iterdescendants(self, tag=None):
        it = self.iter(tag)
        first = next(it, None)
        if first is not None and first is not self:
            yield first
        yield from it

    def itertext(self):
        """All text content in document order: ``text`` of elements
        (not comments) and ``tail`` of every child node."""
        if isinstance(self.tag, str) and self.text:
            yield self.text
        for child in self._children:
            yield from child.itertext()
            if child.tail:
                yield child.tail

    def text_content(self) -> str:
        parts: list[str] = []
        self._gather_text(parts)
        return "".join(parts)

    def _gather_text(self, parts: list) -> None:
        """Fast non-generator itertext (hot path for scoring)."""
        if isinstance(self.tag, str) and self.text:
            parts.append(self.text)
        for child in self._children:
            child._gather_text(parts)
            if child.tail:
                parts.append(child.tail)

    # --- copying ---------------------------------------------------
    def __deepcopy__(self, memo):
        return self.copy_subtree()

    def copy_subtree(self) -> "Element":
        """Detached deep copy of this node (keeps tail, drops parent) —
        matches ``copy.deepcopy`` of an lxml element."""
        new = Element(self.tag, dict(self.attrib), self.text, self.tail)
        for c in self._children:
            cc = c.copy_subtree()
            cc._parent = new
            new._children.append(cc)
        return new

    def __repr__(self):  # pragma: no cover
        return f"<Element {self.tag} at {hex(id(self))}>"


def make_comment(text: str | None = None) -> Element:
    return Element(COMMENT, text=text)


def is_comment(node: Element) -> bool:
    return node.tag is COMMENT


def is_element(node: Element) -> bool:
    return isinstance(node.tag, str)
