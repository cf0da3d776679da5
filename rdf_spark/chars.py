"""Character classes and escape transforms for the RDF 1.1 grammars.

Semantics match the reference tables and helpers in
/root/reference/rune.go:10-116 (PN_CHARS* / PN_LOCAL tables,
disallowed-IRI runes, reserved-char escapes) and the unescape helpers in
/root/reference/lex.go:144-214.  Implementation is regex-first so the
same definitions drive both the per-document Python tokenizer and the
vectorized (pandas / Spark-column) fast paths.
"""

from __future__ import annotations

import re

# --- raw range fragments (regex character-class bodies) ---------------------

_PN_CHARS_BASE_RANGES = (
    "A-Za-z"
    "\u00C0-\u00D6"
    "\u00D8-\u00F6"
    "\u00F8-\u02FF"
    "\u0370-\u037D"
    "\u037F-\u1FFF"
    "\u200C-\u200D"
    "\u2070-\u218F"
    "\u2C00-\u2FEF"
    "\u3001-\uD7FF"
    "\uF900-\uFDCF"
    "\uFDF0-\uFFFD"
    "\U00010000-\U000EFFFF"
)

# NOTE: the reference includes ':' in PN_CHARS_U (rune.go:33), a deliberate
# deviation from the W3C grammar that affects blank-node labels.
_PN_CHARS_U_RANGES = _PN_CHARS_BASE_RANGES + "_:"
_PN_CHARS_RANGES = _PN_CHARS_U_RANGES + "\\-0-9\u00B7\u0300-\u036F\u203F-\u2040"

# PN_LOCAL first char: PN_CHARS_BASE | '_' | ':' | [0-9] | '%' | '\'
# (rune.go:40-59); mid chars additionally '-', middle dots etc (rune.go:60-65).
_PN_LOCAL_FIRST_RANGES = _PN_CHARS_BASE_RANGES + "_:0-9%\\\\"
_PN_LOCAL_MID_RANGES = _PN_CHARS_RANGES + ".%\\\\"

PN_CHARS_BASE_RE = re.compile("[%s]" % _PN_CHARS_BASE_RANGES)
PN_CHARS_U_RE = re.compile("[%s]" % _PN_CHARS_U_RANGES)
PN_CHARS_RE = re.compile("[%s]" % _PN_CHARS_RANGES)
PN_LOCAL_FIRST_RE = re.compile("[%s]" % _PN_LOCAL_FIRST_RANGES)
PN_LOCAL_MID_RE = re.compile("[%s]" % _PN_LOCAL_MID_RANGES)

# Bulk-run scanners (longest run starting at pos) for tokenizer speed.
PN_CHARS_RUN_RE = re.compile("[%s]+" % _PN_CHARS_RANGES)
# PN_LOCAL mid chars that need no special handling ('%' and '\' excluded).
PN_LOCAL_SIMPLE_RUN_RE = re.compile("[%s.]+" % _PN_CHARS_RANGES)

# Blank node label: (PN_CHARS_U | [0-9]) ((PN_CHARS | '.')* PN_CHARS)?
# mirrors lexBNode /root/reference/lex.go:820-849 (inner dots ok, no
# trailing dot).
BNODE_LABEL_RE = re.compile(
    "[%s0-9](?:[%s.]*[%s])?" % (_PN_CHARS_U_RANGES, _PN_CHARS_RANGES, _PN_CHARS_RANGES)
)

# Prefix label (PNAME_NS without ':'): PN_CHARS_BASE ((PN_CHARS|'.')* PN_CHARS)?
# The prefix-label scan terminates at the FIRST ':' (lex.go:905-913, 934-942)
# even though ':' is in the reference's PN_CHARS_U table, so the label
# classes here exclude ':'.
_PN_CHARS_NC_RANGES = _PN_CHARS_BASE_RANGES + "_\\-0-9\u00B7\u0300-\u036F\u203F-\u2040"
PREFIX_LABEL_RE = re.compile(
    "[%s](?:[%s.]*[%s])?" % (_PN_CHARS_BASE_RANGES, _PN_CHARS_NC_RANGES, _PN_CHARS_NC_RANGES)
)

# Language tag as accepted by the reference lexer (lex.go:851-879): rough
# BCP47 — alpha run, then optionally '-' followed by >=1 of [A-Za-z0-9-].
LANG_TAG_RE = re.compile(r"[A-Za-z]+(?:-[A-Za-z0-9-]+)?")

# Disallowed raw characters inside an IRIREF (rune.go:13).  '>' terminates,
# '\' starts an escape; both handled by the scanner.
BAD_IRI_CHARS = frozenset(' <"{}|^`')
# Additionally disallowed when introduced via \u/\U escapes (rune.go:14).
BAD_IRI_CHARS_ESC = frozenset(' <"{}|^`>')

# Characters escapable with '\' inside PN_LOCAL (rune.go:12).
PN_LOCAL_ESC = frozenset("_~.-!$&'()*+,;=/?#@%")

# Scheme per RFC 2396 as checked by hasValidScheme (lex.go:517-535).
SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*:")

HEX_DIGITS = frozenset("0123456789ABCDEFabcdef")
HEX_RUN_RE = re.compile(r"[0-9A-Fa-f]+")

# Scanners used by the literal/IRI body loops: first "interesting" char.
IRI_STOP_RE = re.compile('[ <>"{}|^`\\\\]')
LITERAL_STOP_DQ_RE = re.compile(r'["\\\n\r]')
LITERAL_STOP_SQ_RE = re.compile(r"['\\\n\r]")

_CTRL_UNESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _chr_or_replacement(cp: int) -> str:
    """chr(cp), except invalid code points become U+FFFD.

    Go's bytes.Buffer.WriteRune emits utf8.RuneError (U+FFFD) for runes
    above U+10FFFF or in the surrogate range, so an out-of-range
    \\UXXXXXXXX escape parses successfully in the reference instead of
    erroring; Python's chr() would raise ValueError there, which must
    never escape a parse (it would kill a whole Spark job in
    errors='quarantine' mode).
    """
    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return "�"
    return chr(cp)


def unescape_numeric(s: str) -> str:
    """Resolve string escapes: control escapes plus \\uXXXX / \\UXXXXXXXX.

    Mirrors unescapeNumericString (/root/reference/lex.go:144-192): exactly
    4 (resp. 8) hex digits are consumed after \\u (resp. \\U); validity was
    established during tokenization.  Out-of-range code points become
    U+FFFD, matching Go's WriteRune behaviour.
    """
    if "\\" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == "u":
            out.append(_chr_or_replacement(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(_chr_or_replacement(int(s[i + 2 : i + 10], 16)))
            i += 10
        else:
            out.append(_CTRL_UNESCAPES.get(e, ""))
            i += 2
    return "".join(out)


def unescape_reserved(s: str) -> str:
    """Strip '\\' before PN_LOCAL reserved chars (lex.go:194-214)."""
    if "\\" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append(nxt if nxt in PN_LOCAL_ESC else "")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def escape_literal(s: str) -> str:
    """Canonical N-Triples literal escaping: only \\n \\r \\\" \\\\.

    Mirrors escapeLiteral (/root/reference/rune.go:222-239) — tabs and
    non-ASCII pass through raw, matching the reference's golden outputs.
    """
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")
    )
