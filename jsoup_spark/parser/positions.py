"""Line/column coordinates for tracked source ranges.

Mirror of the reference's LineMap (internal/LineMap.java): line starts are
the offsets immediately after each '\\n' (CharacterReader.java
scanBufferForNewlines); line/column are 1-based; untracked (-1) positions
stay -1. Range string format matches Range.toString:
"line,col:pos-line,col:pos" (e.g. "3,1:16-3,8:23", PositionTest.java:320).
"""
from __future__ import annotations

from bisect import bisect_right

__all__ = ["LineMap", "line_map", "format_range"]


class LineMap:
    __slots__ = ("starts",)

    def __init__(self, source: str):
        starts = []
        i = source.find("\n")
        while i != -1:
            starts.append(i + 1)
            i = source.find("\n", i + 1)
        self.starts = starts

    def line_number(self, pos: int) -> int:
        if pos < 0:
            return -1
        return bisect_right(self.starts, pos) + 1

    def column_number(self, pos: int) -> int:
        if pos < 0:
            return -1
        i = bisect_right(self.starts, pos)
        return pos + 1 if i == 0 else pos - self.starts[i - 1] + 1

    def position(self, pos: int) -> tuple[int, int, int]:
        """(line, column, pos), all 1-based except pos (0-based offset)."""
        return (self.line_number(pos), self.column_number(pos), pos)

    def format_pos(self, pos: int) -> str:
        return f"{self.line_number(pos)},{self.column_number(pos)}:{pos}"

    def format_range(self, r: tuple[int, int] | None) -> str:
        if r is None:
            return "untracked"
        return f"{self.format_pos(r[0])}-{self.format_pos(r[1])}"


def line_map(source: str) -> LineMap:
    return LineMap(source)


def format_range(source_or_map, r) -> str:
    lm = source_or_map if isinstance(source_or_map, LineMap) else LineMap(source_or_map)
    return lm.format_range(r)


class Utf16Map:
    """Codepoint-offset -> UTF-16 code-unit-offset conversion.

    The engine parses Python str (codepoint indices); the reference reads
    Java chars (UTF-16 units), so every position it reports counts astral
    characters twice. Every stamped range boundary in this engine lies on
    a codepoint boundary, so conversion is exact: utf16(i) = i + number of
    astral (>U+FFFF) characters before i.
    """
    __slots__ = ("astral",)

    def __init__(self, source: str):
        self.astral = [i for i, ch in enumerate(source) if ch > "￿"]

    @property
    def identity(self) -> bool:
        return not self.astral

    def convert(self, pos: int) -> int:
        if pos < 0:
            return pos  # untracked stays untracked
        return pos + bisect_right(self.astral, pos - 1)


def convert_ranges_utf16(doc, source: str) -> None:
    """Opt-in post-pass (parse(..., utf16_offsets=True)): rewrite every
    tracked range on the finished tree from codepoint offsets to UTF-16
    code units, and rebuild the line map so columns count UTF-16 units —
    byte-for-byte the reference's Range values on astral-plane inputs."""
    u = Utf16Map(source)
    if u.identity:
        return
    conv = u.convert
    for n in doc.nodes():
        r = getattr(n, "srcr", None)
        if r is not None:
            n.srcr = (conv(r[0]), conv(r[1]))
        r = getattr(n, "endr", None)
        if r is not None:
            n.endr = (conv(r[0]), conv(r[1]))
        ar = getattr(n, "attr_ranges", None)
        if ar:
            for k, (a, b, c, d) in list(ar.items()):
                ar[k] = (conv(a), conv(b), conv(c), conv(d))
    if doc.line_map is not None:
        lm = LineMap.__new__(LineMap)
        lm.starts = [conv(s) for s in doc.line_map.starts]
        doc.line_map = lm
