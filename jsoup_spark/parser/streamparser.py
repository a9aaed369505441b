"""Progressive per-document parse — the reference's StreamParser analog
(parser/StreamParser.java:58-233).

A StreamParser emits each Element as it completes (all children parsed),
via the iterator protocol. To conserve memory the caller may
``Node.remove()`` emitted elements (or their children) from the DOM
during the parse (StreamParser.java:33-36) — this is how a document too
large for memory can still be processed through a DOM interface.

``select_first`` / ``select_next`` run the parse only until a match is
ready, then suspend; iteration or another select resumes it. Selectors
that depend on later siblings (:last-child etc.) need ``complete()``
first, as in the reference.
"""

from __future__ import annotations

from .nodes import Document, Element
from .treebuilder import HtmlTreeBuilder
from ..select.selector import compile_query


class StreamParser:
    """Iterator-style progressive HTML parse with bounded-memory pruning."""

    def __init__(self):
        self._tb: HtmlTreeBuilder | None = None
        self._gen = None
        self._stopped = False
        self._complete = False

    # ------------------------------------------------------------ input
    def parse(self, html: str, base_uri: str = "") -> "StreamParser":
        """Provide the input. Not read until a consuming call."""
        self._tb = HtmlTreeBuilder()
        self._gen = self._tb.parse_stream(html, base_uri)
        self._stopped = False
        self._complete = False
        return self

    # ------------------------------------------------------------ state
    def document(self) -> Document:
        """The Document being parsed into — partial until fully consumed
        (StreamParser.java document())."""
        if self._tb is None or self._tb.doc is None:
            raise ValueError("parse() must be called first")
        return self._tb.doc

    def stop(self) -> "StreamParser":
        """Stop the parse; the iterator returns no further elements."""
        self._stopped = True
        return self

    # ------------------------------------------------------------ consume
    def __iter__(self):
        return self

    def __next__(self) -> Element:
        if self._stopped or self._gen is None:
            raise StopIteration
        try:
            return next(self._gen)
        except StopIteration:
            self._complete = True
            raise

    def stream(self):
        """Alias of iter(self) (StreamParser.stream())."""
        return self

    def complete(self) -> Document:
        """Run the parse to completion and return the Document."""
        for _ in self:
            pass
        return self.document()

    def select_first(self, query):
        """First match in the document, advancing the parse until one is
        complete or input is exhausted (StreamParser.selectFirst)."""
        from ..select.selector import select_first as _sel_first
        ev = compile_query(query) if isinstance(query, str) else query
        doc = self.document()
        found = _sel_first(doc, ev)
        # a match inside the still-open branch may be incomplete; advance
        # until it (or a later match) has been emitted
        open_set = {id(e) for e in self._tb.stack}
        if found is not None and id(found) not in open_set:
            return found
        for el in self:
            if ev.matches(doc, el):
                return el
        found = _sel_first(doc, ev)
        return found

    def select_next(self, query):
        """Next completed match, advancing the parse (selectNext)."""
        ev = compile_query(query) if isinstance(query, str) else query
        doc = self.document()
        for el in self:
            if ev.matches(doc, el):
                return el
        return None
