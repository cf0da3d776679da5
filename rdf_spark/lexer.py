"""Tokenizer for Turtle and its line-based subsets (N-Triples, N-Quads).

Token-level semantics match the reference lexer state machine
(/root/reference/lex.go:355-1016) including its deliberate deviations
from the W3C grammars (e.g. ':' inside blank-node labels, rough BCP47
language tags, SPARQL-style case-insensitive PREFIX/BASE).  The
implementation is a synchronous regex-assisted scanner — the reference's
goroutine+channel pairing (lex.go:87-96) is dropped on purpose: parallelism
in this engine is across documents/partitions, not within one document
(SURVEY.md §4.1).

This module is pure Python with no Spark dependency so it can run inside
Arrow-batched UDFs on executors.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

from rdf_spark import chars

# Token types (mirrors the taxonomy at /root/reference/lex.go:13-47).
(
    EOF,
    EOL,
    ERROR,
    IRI_ABS,
    IRI_REL,
    BNODE,
    LITERAL,
    LITERAL3,
    LITERAL_INTEGER,
    LITERAL_DOUBLE,
    LITERAL_DECIMAL,
    LITERAL_BOOLEAN,
    LANG_MARKER,
    LANG,
    DT_MARKER,
    DOT,
    SEMICOLON,
    COMMA,
    RDF_TYPE,
    PREFIX,
    PREFIX_LABEL,
    IRI_SUFFIX,
    BASE,
    SPARQL_PREFIX,
    SPARQL_BASE,
    ANON_BNODE,
    PLIST_START,
    PLIST_END,
    COLL_START,
    COLL_END,
    GRAPH_KW,
    BLOCK_START,
    BLOCK_END,
    QT_START,
    QT_END,
    ANNOT_START,
    ANNOT_END,
) = range(37)

TOKEN_NAMES = {
    EOF: "EOF", EOL: "EOL", ERROR: "error", IRI_ABS: "IRI (absolute)",
    IRI_REL: "IRI (relative)", BNODE: "blank node", LITERAL: "literal",
    LITERAL3: "literal (long)", LITERAL_INTEGER: "literal (integer)",
    LITERAL_DOUBLE: "literal (double)", LITERAL_DECIMAL: "literal (decimal)",
    LITERAL_BOOLEAN: "literal (boolean)", LANG_MARKER: "@", LANG: "language tag",
    DT_MARKER: "^^", DOT: "dot", SEMICOLON: "semicolon", COMMA: "comma",
    RDF_TYPE: "rdf:type", PREFIX: "@prefix", PREFIX_LABEL: "prefix label",
    IRI_SUFFIX: "IRI suffix", BASE: "@base", SPARQL_PREFIX: "PREFIX",
    SPARQL_BASE: "BASE", ANON_BNODE: "anonymous blank node",
    PLIST_START: "property list start", PLIST_END: "property list end",
    COLL_START: "collection start", COLL_END: "collection end",
    GRAPH_KW: "GRAPH", BLOCK_START: "graph block start",
    BLOCK_END: "graph block end",
    QT_START: "quoted triple start", QT_END: "quoted triple end",
    ANNOT_START: "annotation start", ANNOT_END: "annotation end",
}

_EOF_CH = ""  # sentinel "rune" for end of current buffer

# Characters that may legally follow a bare 'a' used as rdf:type
# (okAfterRDFType, /root/reference/rune.go:15).
_OK_AFTER_RDF_TYPE = frozenset(" \t<\"'")


class Token(NamedTuple):
    typ: int
    line: int
    col: int
    text: str


class Lexer:
    """Line-fed scanner. ``line_mode=True`` emits EOL tokens (N-Triples/N-Quads)."""

    def __init__(self, text: str, line_mode: bool = False):
        # Split on '\n' only, keeping the terminator (bufio.ReadBytes semantics).
        parts = text.split("\n")
        lines = [p + "\n" for p in parts[:-1]]
        if parts[-1] != "":
            lines.append(parts[-1])
        self._lines = lines
        self._line_idx = 0
        self.line_mode = line_mode
        self.input = ""
        self.pos = 0
        self.start = 0
        self.line = 0
        self._width = 0
        self._unesc = False
        self._pending: list[Token] = []
        self._state = None
        self._exhausted = False

    # -- char-level primitives -------------------------------------------

    def _next(self) -> str:
        if self.pos >= len(self.input):
            self._width = 0
            return _EOF_CH
        ch = self.input[self.pos]
        self._width = 1
        self.pos += 1
        return ch

    def _peek(self) -> str:
        if self.pos >= len(self.input):
            return _EOF_CH
        return self.input[self.pos]

    def _backup(self) -> None:
        self.pos -= self._width

    def _ignore(self) -> None:
        self.start = self.pos

    def _emit(self, typ: int) -> None:
        if typ == EOL and not self.line_mode:
            self.start = self.pos
            return
        text = self.input[self.start : self.pos]
        if self._unesc:
            self._unesc = False
            if typ == IRI_SUFFIX:
                text = chars.unescape_reserved(text)
            else:
                text = chars.unescape_numeric(text)
        self._pending.append(Token(typ, self.line, self.start, text))
        self.start = self.pos

    def _errorf(self, msg: str) -> None:
        self._pending.append(Token(ERROR, self.line, self.pos, msg))
        return None

    def _feed(self, overwrite: bool) -> bool:
        while True:
            if self._line_idx >= len(self._lines):
                return False
            line = self._lines[self._line_idx]
            self._line_idx += 1
            self.line += 1
            if line == "" or line[0] == "#":
                # skip empty lines and comment-only lines
                self._emit(EOL)
                continue
            break
        if overwrite:
            self.input += line
        else:
            self.input = line
            self.pos = 0
            self.start = 0
        return True

    # -- token pump --------------------------------------------------------

    def next_token(self) -> Token:
        while not self._pending:
            if self._state is None:
                if self._exhausted or not self._feed(False):
                    self._exhausted = True
                    return Token(EOF, self.line, 0, "")
                self._state = _lex_any
            self._state = self._state(self)
        return self._pending.pop(0)

    def tokens(self) -> Iterator[Token]:
        while True:
            t = self.next_token()
            yield t
            if t.typ == EOF:
                return


# --- state functions (each returns the next state or None) -----------------


def _lex_any(l: Lexer):
    # bulk-skip inter-token whitespace, then dispatch on the next char via
    # table lookup (the reference's switch, lex.go:355-515, as a dict).
    inp = l.input
    pos = l.pos
    n = len(inp)
    while pos < n and (inp[pos] == " " or inp[pos] == "\t"):
        pos += 1
    if pos != l.pos:
        l.pos = pos
        l.start = pos
    if pos >= n:
        l._width = 0
        l._ignore()
        l._emit(EOL)
        return None  # park until next line
    r = inp[pos]
    h = _DISPATCH.get(r)
    if h is not None:
        return h(l)
    if chars.PN_CHARS_BASE_RE.match(r):
        return _lex_prefix_label
    l.pos = pos + 1
    l._width = 1
    return l._errorf("unexpected character: %r" % r)


def _h_at(l: Lexer):
    l._next()
    nch = l._next()
    if nch == "p":
        l.start += 1  # drop '@'
        return _lex_prefix_directive
    if nch == "b":
        l.start += 1
        return _lex_base_directive
    l._backup()
    return l._errorf("unrecognized directive")


def _h_bnode(l: Lexer):
    l._next()
    if l._peek() != ":":
        return l._errorf("illegal character in blank node identifier")
    l._next()  # ':'
    return _lex_bnode


def _h_iri(l: Lexer):
    l._next()
    # RDF-star (Turtle-star/N-Triples-star): '<<' opens a quoted triple.
    # Plain RDF 1.1 inputs are unaffected — a second '<' inside an IRI was
    # always an error (badIRIRunes, /root/reference/rune.go:13).
    if l._peek() == "<":
        l._next()
        l._ignore()
        l._emit(QT_START)
        return _lex_any
    l._ignore()
    return _lex_iri


def _h_qt_close(l: Lexer):
    l._next()
    if l._peek() != ">":
        return l._errorf("unexpected character: '>'")
    l._next()
    l._ignore()
    l._emit(QT_END)
    return _lex_any


def _h_annot_close(l: Lexer):
    l._next()
    if l._peek() != "}":
        return l._errorf("unexpected character: '|'")
    l._next()
    l._ignore()
    l._emit(ANNOT_END)
    return _lex_any


def _h_a(l: Lexer):
    l._next()
    if l._peek() in _OK_AFTER_RDF_TYPE:
        l._emit(RDF_TYPE)
        return _lex_any
    l.pos -= 1  # unread 'a'
    return _lex_prefix_label


def _h_quote(l: Lexer):
    return _lex_literal


def _h_sign(l: Lexer):
    l._next()
    p = l._peek()
    if not (p.isascii() and p.isdigit()):
        return l._errorf("bad literal: illegal number syntax")
    l._backup()
    return _lex_number


def _h_digit(l: Lexer):
    return _lex_number


def _h_plist_open(l: Lexer):
    r = l._next()
    r = l._next()
    while r in " \t" and r != _EOF_CH:
        r = l._next()
    if r == "]":
        l._ignore()
        l._emit(ANON_BNODE)
        return _lex_any
    l._backup()
    l._ignore()
    l._emit(PLIST_START)
    return _lex_any


def _h_plist_close(l: Lexer):
    l._next()
    l._ignore()
    l._emit(PLIST_END)
    return _lex_any


def _h_coll_open(l: Lexer):
    l._next()
    l._ignore()
    l._emit(COLL_START)
    return _lex_any


def _h_coll_close(l: Lexer):
    l._next()
    l._ignore()
    l._emit(COLL_END)
    return _lex_any


def _h_dot(l: Lexer):
    l._next()
    p = l._peek()
    if p != _EOF_CH and p.isascii() and p.isdigit():
        return _lex_number  # number starting with '.' (scan restarts at start)
    l._ignore()
    l._emit(DOT)
    return _lex_any


def _h_cr(l: Lexer):
    l._next()
    if l._peek() == "\n":
        l._next()
        return _lex_any
    l._ignore()
    l._emit(EOL)
    return _lex_any


def _h_nl(l: Lexer):
    l._next()
    l._ignore()
    l._emit(EOL)
    return None


def _h_semi(l: Lexer):
    l._next()
    l._emit(SEMICOLON)
    return _lex_any


def _h_comma(l: Lexer):
    l._next()
    l._emit(COMMA)
    return _lex_any


def _h_hash(l: Lexer):
    l._next()
    l._ignore()
    l._emit(EOL)
    return None  # comment: park until next line


def _h_P(l: Lexer):
    l._next()
    if _accept_ci(l, "PREFIX"):
        l._emit(SPARQL_PREFIX)
        r = l._next()
        while r in " \t" and r != _EOF_CH:
            r = l._next()
        l._backup()
        l._ignore()
        return _lex_prefix_label_in_directive
    l._backup()
    return _lex_prefix_label


def _h_B(l: Lexer):
    l._next()
    if _accept_ci(l, "BASE"):
        l._emit(SPARQL_BASE)
        return _lex_any
    l._backup()
    return _lex_prefix_label


# chars that may legally ABUT the GRAPH keyword (whitespace, an <IRI>,
# or the block itself); frozenset, NOT an `in`-string test — the EOF
# sentinel "" is in every string.  '_' is deliberately absent: 'GRAPH_'
# is itself a valid PN_PREFIX, so 'graph_:s' / 'GRAPH_:b' are prefixed
# names — a blank-node graph label needs whitespace after the keyword.
_AFTER_GRAPH = frozenset(" \t\r\n<{[")


def _h_G(l: Lexer):
    """TriG GRAPH keyword (case-insensitive, exceeds knakk/rdf parity —
    the reference has no TriG, rdf.go:14-22); 'graph…' otherwise lexes as
    a prefixed name exactly as before."""
    l._next()
    if _accept_ci(l, "GRAPH") and l._peek() in _AFTER_GRAPH:
        l._emit(GRAPH_KW)
        return _lex_any
    l.pos = l.start
    return _lex_prefix_label


def _h_block_open(l: Lexer):
    l._next()
    # RDF-star annotation syntax: '{|' opens an annotation block.
    if l._peek() == "|":
        l._next()
        l._ignore()
        l._emit(ANNOT_START)
        return _lex_any
    l._ignore()
    l._emit(BLOCK_START)
    return _lex_any


def _h_block_close(l: Lexer):
    l._next()
    l._ignore()
    l._emit(BLOCK_END)
    return _lex_any


def _h_t(l: Lexer):
    l._next()
    if _accept_exact(l, "true"):
        l._emit(LITERAL_BOOLEAN)
        return _lex_any
    l._backup()
    return _lex_prefix_label


def _h_f(l: Lexer):
    l._next()
    if _accept_exact(l, "false"):
        l._emit(LITERAL_BOOLEAN)
        return _lex_any
    l._backup()
    return _lex_prefix_label


def _accept_exact(l: Lexer, s: str) -> bool:
    if l.input[l.start : l.start + len(s)] == s:
        l.pos = l.start + len(s)
        return True
    return False


def _accept_ci(l: Lexer, s: str) -> bool:
    got = l.input[l.start : l.start + len(s)]
    if len(got) == len(s) and got.upper() == s.upper():
        l.pos = l.start + len(s)
        return True
    return False


def _lex_iri(l: Lexer):
    """IRIREF body: terminates at '>'; validates disallowed chars and
    \\u/\\U escapes; classifies absolute vs relative by RFC2396 scheme
    (mirrors _lexIRI /root/reference/lex.go:537-622)."""
    s = l.input
    while True:
        m = chars.IRI_STOP_RE.search(s, l.pos)
        if m is None:
            l.pos = len(s)
            return l._errorf("bad IRI: no closing '>'")
        l.pos = m.end()
        r = m.group()
        if r == ">":
            break
        if r == "\\":
            # Consume exactly 4 (resp. 8) hex digits — the slice that
            # unescape_numeric will actually substitute — and validate that
            # exact slice; any trailing hex characters are left to the
            # normal IRI body scan.  (The reference's _lexIRI instead
            # consumes the whole hex run and validates its LAST 4 runes,
            # lex.go:562,576 — a quirk that checks a codepoint unescaping
            # never uses; we validate the used slice.)
            esc = l._peek()
            if esc == "u":
                l._next()
                hm = chars.HEX_RUN_RE.match(s, l.pos)
                n_hex = (hm.end() - hm.start()) if hm else 0
                if n_hex < 4:
                    return l._errorf("bad IRI: insufficent hex digits in unicode escape")
                l.pos += 4
                ch = chr(int(s[l.pos - 4 : l.pos], 16))
                if ch in chars.BAD_IRI_CHARS_ESC:
                    return l._errorf("bad IRI: disallowed character in unicode escape")
                l._unesc = True
            elif esc == "U":
                l._next()
                hm = chars.HEX_RUN_RE.match(s, l.pos)
                n_hex = (hm.end() - hm.start()) if hm else 0
                if n_hex < 8:
                    return l._errorf("bad IRI: insufficent hex digits in unicode escape")
                l.pos += 8
                cp = int(s[l.pos - 8 : l.pos], 16)
                if cp > 0x10FFFF:
                    return l._errorf("bad IRI: unicode escape out of range")
                if chr(cp) in chars.BAD_IRI_CHARS_ESC:
                    return l._errorf("bad IRI: disallowed character in unicode escape")
                l._unesc = True
            elif esc == _EOF_CH:
                return l._errorf("bad IRI: no closing '>'")
            else:
                return l._errorf("bad IRI: disallowed escape character %r" % esc)
        else:
            return l._errorf("bad IRI: disallowed character %r" % r)

    # pos is just after '>' now
    l.pos -= 1
    body = s[l.start : l.pos]
    absolute = bool(chars.SCHEME_RE.match(body))
    l._emit(IRI_ABS if absolute else IRI_REL)
    l.pos += 1  # skip '>'
    l._ignore()
    return _lex_any


def _lex_literal(l: Lexer):
    quote = l._next()
    stop_re = chars.LITERAL_STOP_DQ_RE if quote == '"' else chars.LITERAL_STOP_SQ_RE
    quote_count = 1
    l._ignore()
    while quote_count < 6:
        r = l._next()
        if r != quote:
            break
        l._ignore()
        quote_count += 1
    if quote_count == 6:
        l.pos = l.start  # empty long string
    elif quote_count == 2:
        quote_count = 0
        l.pos = l.start  # empty string
    else:
        # scan body; r is the first content char (already consumed)
        while True:
            if r == "\n":
                if quote_count != 3:
                    return l._errorf("bad literal: newline not allowed in single-quoted string")
                if not l._feed(True):
                    return l._errorf("bad literal: no closing quote: %r" % quote)
            elif r == "\r":
                if quote_count != 3:
                    return l._errorf("bad literal: carriage return not allowed in single-quoted string")
            elif r == _EOF_CH:
                return l._errorf("bad literal: no closing quote: %r" % quote)
            elif r == "\\":
                esc = l._next()
                if esc == _EOF_CH:
                    return l._errorf("bad literal: no closing quote %r" % quote)
                if esc in "tbnrf\"'\\":
                    l._unesc = True
                elif esc == "u":
                    hm = chars.HEX_RUN_RE.match(l.input, l.pos)
                    if not hm or hm.end() - hm.start() < 4:
                        return l._errorf("bad literal: insufficent hex digits in unicode escape")
                    l.pos = hm.end()
                    l._unesc = True
                elif esc == "U":
                    hm = chars.HEX_RUN_RE.match(l.input, l.pos)
                    if not hm or hm.end() - hm.start() < 8:
                        return l._errorf("bad literal: insufficent hex digits in unicode escape")
                    l.pos = hm.end()
                    l._unesc = True
                elif esc == _EOF_CH:
                    return l._errorf("bad literal: no closing quote %r" % quote)
                else:
                    return l._errorf("bad literal: disallowed escape character %r" % esc)
            elif r == quote:
                if quote_count == 3:
                    q2 = l._next()
                    if q2 != quote:
                        l._backup()
                        r = l._next()
                        continue
                    q3 = l._next()
                    if q3 != quote:
                        l._backup()
                        r = l._next()
                        continue
                l.pos -= quote_count
                break
            else:
                # bulk-skip uninteresting chars
                m = stop_re.search(l.input, l.pos)
                if m is not None:
                    l.pos = m.start()
                else:
                    l.pos = len(l.input)
            r = l._next()

    l._emit(LITERAL3 if quote_count in (3, 6) else LITERAL)
    if quote_count != 6:
        l.pos += quote_count
    l._ignore()

    # optional language tag or datatype
    r = l._next()
    if r == "@":
        l._emit(LANG_MARKER)
        return _lex_lang
    if r == "^":
        if l._next() != "^":
            return l._errorf("bad literal: invalid datatype IRI")
        l._emit(DT_MARKER)
        return _lex_any
    if r in " \t":
        l._ignore()
        return _lex_any
    l._backup()
    return _lex_any


def _lex_number(l: Lexer):
    """Numeric shorthand (mirrors lexNumber /root/reference/lex.go:748-818).

    Scans from l.start so that sign / leading-dot prefixes already consumed
    by the dispatcher are included in the token.
    """
    s = l.input
    i = l.start
    n = len(s)
    if s[i] in "+-":
        i += 1
    got_dot = s[i] == "."
    got_e = False
    i += 1  # first digit (or leading '.') consumed
    while True:
        r = s[i] if i < n else _EOF_CH
        if r == _EOF_CH:
            break
        if r.isascii() and r.isdigit():
            i += 1
            continue
        if r == ".":
            if got_dot:
                break
            p = s[i + 1] if i + 1 < n else _EOF_CH
            if not (p.isascii() and p.isdigit()) and (p == _EOF_CH or p not in "eE"):
                break  # statement-terminating dot
            got_dot = True
            i += 1
            continue
        if r in "eE":
            if got_e:
                l.pos = i
                return l._errorf("bad literal: illegal number syntax")
            got_e = True
            i += 1
            p = s[i] if i < n else _EOF_CH
            if p != _EOF_CH and p in "+-":
                i += 1
            elif not (p.isascii() and p.isdigit()):
                l.pos = i
                return l._errorf("bad literal: illegal number syntax: missing exponent")
            continue
        if r in " ,;)]" or r == _EOF_CH:
            break
        l.pos = i
        return l._errorf("bad literal: illegal number syntax (number followed by %r)" % r)
    l.pos = i
    if got_e:
        l._emit(LITERAL_DOUBLE)
    elif got_dot:
        l._emit(LITERAL_DECIMAL)
    else:
        l._emit(LITERAL_INTEGER)
    return _lex_any


def _lex_bnode(l: Lexer):
    m = chars.BNODE_LABEL_RE.match(l.input, l.pos)
    if m is None:
        if l._peek() == _EOF_CH:
            return l._errorf("bad blank node: unexpected end of line")
        return l._errorf("bad blank node: invalid character %r" % l._peek())
    l.pos = m.end()
    l._emit(BNODE)  # token text includes the leading '_:'
    return _lex_any


def _lex_lang(l: Lexer):
    m = chars.LANG_TAG_RE.match(l.input, l.pos)
    if m is None:
        return l._errorf("bad literal: invalid language tag")
    # reference also errors on 'en-' style dangling dash with empty 2nd run
    end = m.end()
    if end < len(l.input) and l.input[end] == "-":
        # first run consumed a '-' that has no valid continuation
        return l._errorf("bad literal: invalid language tag")
    l.pos = end
    l._emit(LANG)
    return _lex_any


def _lex_prefix_directive(l: Lexer):
    if _accept_exact(l, "prefix"):
        l._emit(PREFIX)
        r = l._next()
        while r in " \t" and r != _EOF_CH:
            r = l._next()
        l._backup()
        l._ignore()
        return _lex_prefix_label_in_directive
    return l._errorf("invalid character 'p'")


def _lex_base_directive(l: Lexer):
    if _accept_exact(l, "base"):
        l._emit(BASE)
        return _lex_any
    return l._errorf("invalid character 'b'")


def _lex_prefix_label_in_directive(l: Lexer):
    if l._peek() == ":":
        l._next()
        l._emit(PREFIX_LABEL)  # empty prefix stored as ':' (lex.go:896-899)
        return _lex_any
    m = chars.PREFIX_LABEL_RE.match(l.input, l.pos)
    if m is None:
        return l._errorf("unexpected character: %r" % l._peek())
    l.pos = m.end()
    if l._peek() != ":":
        return l._errorf("illegal token: %r" % l.input[l.start : l.pos + 1])
    l._emit(PREFIX_LABEL)
    l._next()  # ':'
    l._ignore()
    return _lex_any


def _lex_prefix_label(l: Lexer):
    l._ignore()
    if l._peek() == ":":
        l._next()
        l._emit(PREFIX_LABEL)  # text is ':' — empty-prefix key
        return _lex_iri_suffix
    m = chars.PREFIX_LABEL_RE.match(l.input, l.pos)
    if m is None:
        return l._errorf("unexpected character: %r" % l._peek())
    l.pos = m.end()
    if l._peek() != ":":
        return l._errorf("illegal token: %r" % l.input[l.start : l.pos + 1])
    l._emit(PREFIX_LABEL)
    l._next()  # ':'
    l._ignore()
    p = l._peek()
    if p == "#" or p in " \t\r\n" or p == _EOF_CH:
        l._emit(IRI_SUFFIX)  # empty suffix
        return _lex_any
    return _lex_iri_suffix


def _lex_iri_suffix(l: Lexer):
    """PN_LOCAL (mirrors lexIRISuffix /root/reference/lex.go:963-1008)."""
    r = l._next()
    if r == " ":
        l._ignore()
        l._emit(IRI_SUFFIX)
        return _lex_any
    if not chars.PN_LOCAL_FIRST_RE.match(r):
        return l._errorf("unexpected character: %r" % r)
    if r in ("\\", "%"):
        l._backup()
    s = l.input
    n = len(s)
    while True:
        m = chars.PN_LOCAL_SIMPLE_RUN_RE.match(s, l.pos)
        if m:
            l.pos = m.end()
        c = s[l.pos] if l.pos < n else _EOF_CH
        if c == "\\":
            l.pos += 1
            p = s[l.pos] if l.pos < n else _EOF_CH
            if p in chars.PN_LOCAL_ESC:
                l._unesc = True
                l.pos += 1
                continue
            return l._errorf("invalid escape charater %r" % p)
        if c == "%":
            l.pos += 1
            hm = chars.HEX_RUN_RE.match(s, l.pos)
            if not hm or hm.end() - hm.start() < 2:
                return l._errorf("invalid hex escape sequence")
            l.pos = hm.end()
            continue
        break
    # trailing single '.' is not part of the local name
    if l.pos - 1 >= 0 and s[min(n - 1, l.pos - 1)] == "." and s[min(n - 2, l.pos - 2)] != "\\":
        l.pos -= 1
    l._emit(IRI_SUFFIX)
    return _lex_any


# Dispatch table for _lex_any (built after all handlers are defined).
# Plain ASCII letters that aren't keyword starters go straight to the
# prefixed-name scanner; non-ASCII PN_CHARS_BASE falls back to the regex
# check inside _lex_any.
_DISPATCH = {
    "@": _h_at, "_": _h_bnode, "<": _h_iri, "a": _h_a,
    ":": _lex_prefix_label, "'": _h_quote, '"': _h_quote,
    "+": _h_sign, "-": _h_sign,
    "[": _h_plist_open, "]": _h_plist_close,
    "(": _h_coll_open, ")": _h_coll_close,
    ".": _h_dot, "\r": _h_cr, "\n": _h_nl,
    ";": _h_semi, ",": _h_comma, "#": _h_hash,
    "P": _h_P, "p": _h_P, "B": _h_B, "b": _h_B,
    "t": _h_t, "f": _h_f,
    "G": _h_G, "g": _h_G,
    "{": _h_block_open, "}": _h_block_close,
    ">": _h_qt_close, "|": _h_annot_close,
}
for _d in "0123456789":
    _DISPATCH[_d] = _h_digit
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _DISPATCH.setdefault(_c, _lex_prefix_label)
