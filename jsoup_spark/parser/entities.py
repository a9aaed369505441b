"""HTML character-reference (entity) tables and decoding.

Mirrors the reference's entity semantics (parser/Tokeniser.java:137-221,
nodes/Entities.java:42-158):

* full named set = the 2125-name WHATWG table — identical to Python's
  stdlib ``html.entities.html5`` (verified against the reference's extended
  table); requires a trailing ``;``.
* base set = the 106 HTML4 names, matchable WITHOUT a trailing ``;``;
  also used for longest-prefix fallback in text (not attributes).
* numeric refs: decimal/hex, optional ``;``; 0x80-0x9F remapped through the
  windows-1252 extension table; invalid/out-of-range -> U+FFFD.
* in attributes: a name match followed by ``=``, ``-``, ``_`` or
  alphanumeric does not decode (legacy URL-query protection).

Pure data + functions — broadcastable, importable in UDF workers.
"""

from __future__ import annotations

import html.entities as _he

REPLACEMENT = "�"

# Full WHATWG table: name (with ';' stripped) -> replacement string
# (may be 2 codepoints for multipoint entities).
FULL: dict[str, str] = {
    k[:-1]: v for k, v in _he.html5.items() if k.endswith(";")
}

# 106 base (HTML4) names — match without a semicolon.
# (behavioral data per nodes/Entities.java:50, verified via the reference)
BASE_NAMES = frozenset("""
AElig AMP Aacute Acirc Agrave Aring Atilde Auml COPY Ccedil ETH Eacute
Ecirc Egrave Euml GT Iacute Icirc Igrave Iuml LT Ntilde Oacute Ocirc Ograve
Oslash Otilde Ouml QUOT REG THORN Uacute Ucirc Ugrave Uuml Yacute aacute
acirc acute aelig agrave amp aring atilde auml brvbar ccedil cedil cent
copy curren deg divide eacute ecirc egrave eth euml frac12 frac14 frac34 gt
iacute icirc iexcl igrave iquest iuml laquo lt macr micro middot nbsp not
ntilde oacute ocirc ograve ordf ordm oslash otilde ouml para plusmn pound
quot raquo reg sect shy sup1 sup2 sup3 szlig thorn times uacute ucirc
ugrave uml uuml yacute yen yuml
""".split())

# longest base name is 6 chars; prefix fallback checks spans directly
_BASE_MAX_LEN = max(len(n) for n in BASE_NAMES)

# windows-1252 remap of numeric refs 0x80..0x9F (Tokeniser.java:20-28)
WIN1252 = [
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178,
]

import re as _re

_P_NAMEREF = _re.compile("[a-zA-Z]+[0-9]*")
_HEX = "0123456789abcdefABCDEF"
_DIGITS = "0123456789"
_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LETTER_SET = frozenset(_LETTERS)
_DIGIT_SET = frozenset(_DIGITS)
_NOT_CHARREF = frozenset("\t\n\r\f <&")


def find_base_prefix(name: str) -> str:
    """Longest base entity that is a prefix of `name` ('' if none)."""
    for ln in range(min(_BASE_MAX_LEN, len(name)), 1, -1):
        if name[:ln] in BASE_NAMES:
            return name[:ln]
    return ""


def consume_charref(
    s: str, i: int, additional_allowed: str | None, in_attribute: bool,
    errors: list | None = None,
) -> tuple[str | None, int]:
    """Try to consume a character reference at position ``i`` (just past '&').

    Returns (decoded_string_or_None, new_position). When None, caller emits a
    literal '&' and continues from the returned position (== i).
    Mirrors Tokeniser.consumeCharacterReference (Tokeniser.java:137-221).
    """
    n = len(s)
    if i >= n:
        return None, i
    c = s[i]
    if additional_allowed is not None and c == additional_allowed:
        return None, i
    if c in _NOT_CHARREF:
        return None, i

    if c == "#":  # numeric
        j = i + 1
        hexmode = j < n and s[j] in "xX"
        if hexmode:
            j += 1
        start = j
        allowed = _HEX if hexmode else _DIGITS
        while j < n and s[j] in allowed:
            j += 1
        if j == start:  # no numerals
            return None, i
        numref = s[start:j]
        if j < n and s[j] == ";":
            j += 1
        try:
            charval = int(numref, 16 if hexmode else 10)
        except ValueError:
            charval = -1
        if charval == -1 or charval > 0x10FFFF:
            return REPLACEMENT, j
        if 0x80 <= charval <= 0x9F:
            charval = WIN1252[charval - 0x80]
        if 0xD800 <= charval <= 0xDFFF or charval == 0:
            return REPLACEMENT, j
        return chr(charval), j

    # named: letters then digits (CharacterReader.consumeLetterThenDigitSequence)
    m = _P_NAMEREF.match(s, i)
    if m is None:
        return None, i
    j = m.end()
    name = s[i:j]
    looks_legit = j < n and s[j] == ";"
    found = name in BASE_NAMES or (looks_legit and name in FULL)

    if not found:
        if in_attribute:
            return None, i
        prefix = find_base_prefix(name)
        if not prefix:
            return None, i
        name = prefix
        j = i + len(prefix)
        looks_legit = j < n and s[j] == ";"

    if in_attribute and j < n and (s[j] in _LETTER_SET or s[j] in _DIGIT_SET or s[j] in "=-_"):
        return None, i

    if looks_legit:
        j += 1
    return FULL[name], j


def unescape(s: str, in_attribute: bool = False) -> str:
    """Decode all character references in a string (Entities semantics)."""
    if "&" not in s:
        return s
    out: list[str] = []
    pos = 0
    n = len(s)
    while True:
        amp = s.find("&", pos)
        if amp == -1:
            out.append(s[pos:])
            break
        out.append(s[pos:amp])
        decoded, newpos = consume_charref(s, amp + 1, None, in_attribute)
        if decoded is None:
            out.append("&")
            pos = amp + 1
        else:
            out.append(decoded)
            pos = newpos
    return "".join(out)


# --- escaping (for the HTML serializer; Entities.escape, Entities.java:160-230) ---

_XHTML_ESC = {"<": "&lt;", ">": "&gt;", "&": "&amp;", '"': "&quot;"}


def escape(text: str, *, in_attribute: bool = False, syntax: str = "html") -> str:
    """Escape text for HTML output (base escape mode, UTF-8 charset).

    Matches the subset of Entities.escape used by the default serializer:
    &, <, > (in text), ", (in attributes), and nbsp -> &nbsp;.
    """
    out = text.replace("&", "&amp;").replace("\xa0", "&nbsp;")
    if in_attribute:
        out = out.replace('"', "&quot;")
        if syntax == "xml":
            out = out.replace("<", "&lt;").replace(">", "&gt;")
    else:
        out = out.replace("<", "&lt;").replace(">", "&gt;")
    return out
