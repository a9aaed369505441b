"""Public traversal API: NodeVisitor / NodeFilter semantics.

Mirrors select/NodeTraversor.java:30-161 — a depth-first head/tail walk
with a mutation-safe cursor (the visitor may remove the current node), and
a filter variant supporting CONTINUE / SKIP_CHILDREN / SKIP_ENTIRELY /
REMOVE / STOP. Plus a lazy restartable NodeIterator
(nodes/NodeIterator.java:17).
"""

from __future__ import annotations

from enum import Enum

from ..parser.nodes import Element, Node


class FilterResult(Enum):
    CONTINUE = 1
    SKIP_CHILDREN = 2
    SKIP_ENTIRELY = 3
    REMOVE = 4
    STOP = 5


def _parent_and_next(node: Node):
    parent = node.parent
    if parent is None:
        return None, None
    children = parent.children
    for i, c in enumerate(children):
        if c is node:
            return parent, (children[i + 1] if i + 1 < len(children) else None)
    return parent, None


def traverse(visitor, root: Node) -> None:
    """Depth-first walk calling visitor.head(node, depth) then, after the
    node's subtree, visitor.tail(node, depth). head() may remove the
    current node; the cursor recovers from a pre-call snapshot."""
    node = root
    depth = 0
    while node is not None:
        parent, nxt = _parent_and_next(node)
        visitor.head(node, depth)
        removed = node is not root and node.parent is None
        if removed:
            if nxt is not None:
                node = nxt
                continue
            node = parent
            depth -= 1
            if node is None:
                return
            # fall through: emit parent's tail chain
        elif isinstance(node, Element) and node.children:
            node = node.children[0]
            depth += 1
            continue
        while True:
            visitor.tail(node, depth)
            if node is root:
                return
            parent, nxt = _parent_and_next(node)
            if nxt is not None:
                node = nxt
                break
            node = parent
            depth -= 1
            if node is None:
                return


def filter(node_filter, root: Node) -> FilterResult:
    """Filtered traversal (NodeTraversor.java:115-161). node_filter.head
    (and optional .tail) return a FilterResult steering the walk."""
    node = root
    depth = 0
    while node is not None:
        result = node_filter.head(node, depth)
        if result == FilterResult.STOP:
            return result
        if result == FilterResult.CONTINUE and isinstance(node, Element) \
                and node.children:
            node = node.children[0]
            depth += 1
            continue
        while True:
            if result != FilterResult.REMOVE:
                tail_fn = getattr(node_filter, "tail", None)
                tail_res = tail_fn(node, depth) if tail_fn is not None \
                    else FilterResult.CONTINUE
                if tail_res == FilterResult.STOP:
                    return tail_res
            parent, nxt = _parent_and_next(node)
            if result == FilterResult.REMOVE:
                node.remove()
            result = FilterResult.CONTINUE
            if node is root:
                return FilterResult.CONTINUE
            if nxt is not None:
                node = nxt
                break
            node = parent
            depth -= 1
            if node is None:
                return FilterResult.CONTINUE
            if node is root:
                tail_fn = getattr(node_filter, "tail", None)
                if tail_fn is not None \
                        and tail_fn(node, depth) == FilterResult.STOP:
                    return FilterResult.STOP
                return FilterResult.CONTINUE
    return FilterResult.CONTINUE


class NodeIterator:
    """Lazy DFS node iterator over start and its descendants; restartable
    via restart(); optionally filtered to a node type."""

    def __init__(self, start: Node, node_type=Node):
        self._start = start
        self._type = node_type
        self._current: Node | None = None
        self.restart(start)

    def restart(self, start: Node) -> None:
        self._start = start
        self._current = None
        self._pending = start if isinstance(start, self._type) else None
        if self._pending is None:
            self._pending = self._advance_from(start)

    def __iter__(self):
        return self

    def __next__(self) -> Node:
        if self._pending is None and self._current is not None:
            self._pending = self._advance_from(self._current)
        if self._pending is None:
            raise StopIteration
        out = self._pending
        self._current = out
        self._pending = None
        return out

    def _advance_from(self, node: Node):
        while True:
            node = self._succ(node)
            if node is None:
                return None
            if isinstance(node, self._type):
                return node

    def _succ(self, node: Node):
        if isinstance(node, Element) and node.children:
            return node.children[0]
        while node is not None and node is not self._start:
            parent, nxt = _parent_and_next(node)
            if nxt is not None:
                return nxt
            node = parent
        return None
