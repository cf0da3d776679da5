"""Document-level parsers: N-Triples, N-Quads, Turtle → triple/quad tuples.

Parse semantics match the reference decoders:
  * N-Triples: /root/reference/nt.go:22-100 (line grammar, 2-token lookahead)
  * N-Quads:   /root/reference/nq.go:6-86 (optional 4th term, default graph)
  * Turtle:    /root/reference/ttl.go:56-450 (directives, prefixed names,
    property lists, collections, per-document blank-node counter)

These are pure-Python, per-document routines designed to run inside
Arrow-batched UDFs; errors raise :class:`ParseError` (the caller decides
strict-abort vs quarantine — SURVEY.md §4.1 "fail-fast" row).
"""

from __future__ import annotations

import hashlib

from rdf_spark import lexer as lx
from rdf_spark.chars import escape_literal
from rdf_spark.terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    DEFAULT_GRAPH,
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    RDF_LANG_STRING,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

# RDF reification vocabulary — the RDF-1.1-compatible encoding of RDF-star
# quoted triples (the CG report's "unstar" mapping): each distinct quoted
# triple becomes one statement node carrying these four triples.
RDF_STATEMENT = RDF_NS + "Statement"
RDF_SUBJECT = RDF_NS + "subject"
RDF_PREDICATE = RDF_NS + "predicate"
RDF_OBJECT = RDF_NS + "object"


class ParseError(ValueError):
    def __init__(self, line: int, col: int, msg: str):
        super().__init__("%d:%d: %s" % (line, col, msg))
        self.line = line
        self.col = col
        self.msg = msg


# Exceptions a malformed input line/document may legitimately raise.  The
# quarantine wrappers catch this tuple, never bare Exception: one malformed
# page must not kill a 10^12-document job, but genuine code bugs (TypeError,
# KeyError, ...) should still surface.  ValueError covers ParseError plus
# stray conversion errors; RecursionError covers adversarially nested
# Turtle collections / property lists; OverflowError covers pathological
# numeric lexicals.
QUARANTINE_ERRORS = (ValueError, OverflowError, RecursionError)


class _TokenStream:
    """Token cursor with unbounded pushback (covers the reference's 2- and
    3-token lookahead buffers)."""

    __slots__ = ("_lex", "_buf")

    def __init__(self, lex: lx.Lexer):
        self._lex = lex
        self._buf: list[lx.Token] = []

    def next(self) -> lx.Token:
        if self._buf:
            return self._buf.pop()
        return self._lex.next_token()

    def peek(self) -> lx.Token:
        t = self.next()
        self._buf.append(t)
        return t

    def backup(self, tok: lx.Token) -> None:
        self._buf.append(tok)

    def expect(self, context: str, *types: int) -> lx.Token:
        t = self.next()
        if t.typ in types:
            return t
        if t.typ == lx.ERROR:
            raise ParseError(t.line, t.col, "syntax error: %s" % t.text)
        raise ParseError(
            t.line, t.col, "unexpected %s as %s" % (lx.TOKEN_NAMES.get(t.typ, t.typ), context)
        )


# ---------------------------------------------------------------------------
# RDF-star quoted triples (Turtle-star / N-Triples-star / N-Quads-star)
# ---------------------------------------------------------------------------


def _term_ser(t: tuple) -> str:
    """Canonical N-Triples serialization of a term 4-tuple — the content
    key a quoted triple's statement node is minted from."""
    lex, kind, dt, lang = t
    if kind == KIND_IRI:
        return "<%s>" % lex
    if kind == KIND_BLANK:
        return lex
    s = '"%s"' % escape_literal(lex)
    if lang:
        return s + "@" + lang
    if dt is not None and dt != XSD_STRING:
        return s + "^^<" + dt + ">"
    return s


class _QtMinter:
    """Per-document quoted-triple → statement-node mapping.

    A GROUND quoted triple (no blank nodes anywhere inside) mints the
    globally stable IRI ``urn:rdfstar:<md5 of its canonical N-Triples
    serialization>`` — the same quoted fact in two documents resolves to
    the same node, so the final dedup merges their annotation edges (the
    property a fusion layer wants).  A quoted triple CONTAINING a blank
    node mints the document-scoped blank label ``_:qt<md5>`` instead
    (its referents are doc-scoped, so the node must be too; the url-keyed
    skolemizer then makes it globally unique like any other blank).

    Each distinct quoted triple expands ONCE per document into the four
    standard reification triples (rdf:type rdf:Statement / rdf:subject /
    rdf:predicate / rdf:object) via the ``emit`` callback.
    """

    __slots__ = ("memo", "journal")

    def __init__(self):
        self.memo: dict[str, tuple] = {}
        # when a line-parallel caller shares one minter across lines, a
        # line that quarantines AFTER memoizing a quoted triple would
        # poison the memo: its reification emits die with the failed
        # line, and a later clean line quoting the same fact would find
        # the memo hit and emit nothing.  Callers set ``journal`` to a
        # fresh list per line and delete the journaled keys on failure.
        self.journal: list[str] | None = None

    def term(self, s: tuple, p: tuple, o: tuple, emit) -> tuple:
        key = "%s %s %s" % (_term_ser(s), _term_ser(p), _term_ser(o))
        qt = self.memo.get(key)
        if qt is not None:
            return qt
        h = hashlib.md5(key.encode("utf-8")).hexdigest()
        if s[1] == KIND_BLANK or o[1] == KIND_BLANK:
            qt = ("_:qt" + h, KIND_BLANK, None, None)
        else:
            qt = ("urn:rdfstar:" + h, KIND_IRI, None, None)
        self.memo[key] = qt
        if self.journal is not None:
            self.journal.append(key)
        emit((qt[0], qt[1], RDF_TYPE, RDF_STATEMENT, KIND_IRI, None, None))
        emit((qt[0], qt[1], RDF_SUBJECT, s[0], s[1], None, None))
        emit((qt[0], qt[1], RDF_PREDICATE, p[0], KIND_IRI, None, None))
        emit((qt[0], qt[1], RDF_OBJECT, o[0], o[1], o[2], o[3]))
        return qt


def _parse_nt_quoted(ts: _TokenStream, qt: _QtMinter, emit) -> tuple:
    """``<< s p o >>`` in the line formats (N-Triples-star grammar:
    subject IRI|bnode|quoted, predicate IRI, object any term|quoted)."""
    tok = ts.expect("quoted subject", lx.IRI_ABS, lx.BNODE, lx.QT_START)
    if tok.typ == lx.QT_START:
        s = _parse_nt_quoted(ts, qt, emit)
    elif tok.typ == lx.BNODE:
        s = (tok.text, KIND_BLANK, None, None)
    else:
        s = (tok.text, KIND_IRI, None, None)
    ptok = ts.expect("quoted predicate", lx.IRI_ABS)
    p = (ptok.text, KIND_IRI, None, None)
    tok = ts.expect(
        "quoted object", lx.IRI_ABS, lx.BNODE, lx.LITERAL, lx.QT_START
    )
    if tok.typ == lx.QT_START:
        o = _parse_nt_quoted(ts, qt, emit)
    elif tok.typ == lx.BNODE:
        o = (tok.text, KIND_BLANK, None, None)
    elif tok.typ == lx.LITERAL:
        ol, odt, olang = _parse_nt_object_literal(ts, tok)
        o = (ol, KIND_LITERAL, odt, olang)
    else:
        o = (tok.text, KIND_IRI, None, None)
    ts.expect("quoted triple end", lx.QT_END)
    return qt.term(s, p, o, emit)


# ---------------------------------------------------------------------------
# N-Triples / N-Quads (line formats)
# ---------------------------------------------------------------------------


def _parse_nt_object_literal(ts: _TokenStream, tok: lx.Token):
    """Literal object with optional @lang / ^^<dt> (nt.go:52-70)."""
    o, o_dt, o_lang = tok.text, XSD_STRING, None
    p = ts.peek()
    if p.typ == lx.LANG_MARKER:
        ts.next()
        lt = ts.expect("literal language", lx.LANG)
        o_lang = lt.text
        o_dt = RDF_LANG_STRING
    elif p.typ == lx.DT_MARKER:
        ts.next()
        dt = ts.expect("literal datatype", lx.IRI_ABS)
        o_dt = dt.text
    return o, o_dt, o_lang


def parse_ntriples(text: str, qt: _QtMinter | None = None) -> list[tuple]:
    """Strict whole-document N-Triples parse → list of 7-tuples.

    N-Triples-star: ``<< s p o >>`` quoted triples in subject/object
    position resolve to statement nodes (see :class:`_QtMinter`), each
    expanding once into the four reification triples.  ``qt`` lets a
    LINE-PARALLEL caller (arrow_fast) share one minter across the lines
    of a batch so a fact quoted on several lines expands once per
    batch, not once per line — across batches/partitions duplicates are
    identical by content-keying and collapse in dedup_triples."""
    ts = _TokenStream(lx.Lexer(text, line_mode=True))
    out = []
    if qt is None:
        qt = _QtMinter()
    while True:
        while ts.peek().typ == lx.EOL:
            ts.next()
        if ts.peek().typ == lx.EOF:
            return out

        tok = ts.expect("subject", lx.IRI_ABS, lx.BNODE, lx.QT_START)
        if tok.typ == lx.QT_START:
            s, s_kind = _parse_nt_quoted(ts, qt, out.append)[:2]
        else:
            s = tok.text
            s_kind = KIND_IRI if tok.typ == lx.IRI_ABS else KIND_BLANK

        tok = ts.expect("predicate", lx.IRI_ABS)
        p = tok.text

        tok = ts.expect(
            "object", lx.IRI_ABS, lx.BNODE, lx.LITERAL, lx.QT_START
        )
        if tok.typ == lx.QT_START:
            ot = _parse_nt_quoted(ts, qt, out.append)
            row = (s, s_kind, p, ot[0], ot[1], None, None)
        elif tok.typ == lx.BNODE:
            row = (s, s_kind, p, tok.text, KIND_BLANK, None, None)
        elif tok.typ == lx.LITERAL:
            o, o_dt, o_lang = _parse_nt_object_literal(ts, tok)
            row = (s, s_kind, p, o, KIND_LITERAL, o_dt, o_lang)
        else:
            row = (s, s_kind, p, tok.text, KIND_IRI, None, None)

        ts.expect("dot (.)", lx.DOT)
        ts.expect("end of line", lx.EOL)
        out.append(row)


def parse_nquads(text: str, qt: _QtMinter | None = None) -> list[tuple]:
    """Strict whole-document N-Quads parse → list of 9-tuples; the default
    graph is the blank node ``_:defaultGraph`` (decoder.go:89).

    N-Quads-star: quoted triples resolve as in :func:`parse_ntriples`;
    a statement node's reification triples land in the graph of the
    FIRST quad that quotes it (later quotes in other graphs reuse the
    node without re-emitting; in the line-parallel path the rule holds
    per batch — see :func:`parse_ntriples` on the shared ``qt``)."""
    ts = _TokenStream(lx.Lexer(text, line_mode=True))
    out = []
    if qt is None:
        qt = _QtMinter()
    while True:
        while ts.peek().typ == lx.EOL:
            ts.next()
        if ts.peek().typ == lx.EOF:
            return out

        g, g_kind = DEFAULT_GRAPH, KIND_BLANK
        reif: list[tuple] = []

        tok = ts.expect("subject", lx.IRI_ABS, lx.BNODE, lx.QT_START)
        if tok.typ == lx.QT_START:
            s, s_kind = _parse_nt_quoted(ts, qt, reif.append)[:2]
        else:
            s = tok.text
            s_kind = KIND_IRI if tok.typ == lx.IRI_ABS else KIND_BLANK

        tok = ts.expect("predicate", lx.IRI_ABS)
        p = tok.text

        tok = ts.expect(
            "object", lx.IRI_ABS, lx.BNODE, lx.LITERAL, lx.QT_START
        )
        if tok.typ == lx.QT_START:
            ot = _parse_nt_quoted(ts, qt, reif.append)
            o, o_kind, o_dt, o_lang = ot[0], ot[1], None, None
        elif tok.typ == lx.BNODE:
            o, o_kind, o_dt, o_lang = tok.text, KIND_BLANK, None, None
        elif tok.typ == lx.LITERAL:
            o, o_dt, o_lang = _parse_nt_object_literal(ts, tok)
            o_kind = KIND_LITERAL
        else:
            o, o_kind, o_dt, o_lang = tok.text, KIND_IRI, None, None

        nxt = ts.peek()
        if nxt.typ == lx.IRI_ABS:
            ts.next()
            g, g_kind = nxt.text, KIND_IRI
        elif nxt.typ == lx.BNODE:
            ts.next()
            g, g_kind = nxt.text, KIND_BLANK
        elif nxt.typ != lx.DOT:
            ts.expect("graph", lx.IRI_ABS, lx.BNODE)

        ts.expect("dot (.)", lx.DOT)
        ts.expect("end of line", lx.EOL)
        for r in reif:
            out.append(r + (g, g_kind))
        out.append((s, s_kind, p, o, o_kind, o_dt, o_lang, g, g_kind))


# ---------------------------------------------------------------------------
# Turtle
# ---------------------------------------------------------------------------

_CTX_TOP = 0
_CTX_COLL = 1
_CTX_LIST = 2
_CTX_ANNOT = 3

# term = (lex, kind, datatype, lang); subjects/predicates use datatype=lang=None
_NIL_TERM = (RDF_NIL, KIND_IRI, None, None)


class TurtleParser:
    """Recursive-descent Turtle parser mirroring the ttl state machine
    (ttl.go:100-445) as a plain driver loop: directives mutate parser state,
    nested property lists / collections use an explicit context stack, and
    anonymous blank nodes mint ``_:b%d`` from a per-document counter
    (ttl.go:244-245 — the skolemization seed, see SURVEY.md §4.3)."""

    def __init__(self, text: str, base: str = ""):
        self.ts = _TokenStream(lx.Lexer(text, line_mode=False))
        self.base = base
        self.ns: dict[str, str] = {}
        self.bnode_n = 0
        self._qt = _QtMinter()
        # current triple: [subj, pred, obj, ctx]; terms are 4-tuples or None
        self.cur = [None, None, None, _CTX_TOP]
        self.stack: list[list] = []
        self.out: list[tuple] = []

    # -- helpers -----------------------------------------------------------

    def _mint_bnode(self) -> tuple:
        self.bnode_n += 1
        return ("_:b%d" % self.bnode_n, KIND_BLANK, None, None)

    # -- RDF-star (Turtle-star) --------------------------------------------

    def _append_reif(self, row: tuple) -> None:
        """Emit one reification row of a quoted triple (TrigParser
        overrides to extend with the enclosing graph columns)."""
        self.out.append(row)

    def _parse_qt_term(self, subject: bool) -> tuple:
        """One term inside ``<< … >>`` (Turtle-star grammar: subject is
        IRI | bnode | quoted; object additionally any literal — no anon
        bnodes, property lists, or collections inside quoted triples)."""
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.QT_START:
            return self._parse_quoted()
        if typ == lx.IRI_ABS:
            return (tok.text, KIND_IRI, None, None)
        if typ == lx.IRI_REL:
            return (self.base + tok.text, KIND_IRI, None, None)
        if typ == lx.PREFIX_LABEL:
            return (self._pname(tok), KIND_IRI, None, None)
        if typ == lx.BNODE:
            return (tok.text, KIND_BLANK, None, None)
        if not subject:
            if typ in (lx.LITERAL, lx.LITERAL3):
                o, o_dt, o_lang = tok.text, XSD_STRING, None
                p = ts.peek()
                if p.typ == lx.LANG_MARKER:
                    ts.next()
                    lt = ts.expect("literal language", lx.LANG)
                    o_lang = lt.text
                    o_dt = RDF_LANG_STRING
                elif p.typ == lx.DT_MARKER:
                    ts.next()
                    dt = ts.expect(
                        "literal datatype", lx.IRI_ABS, lx.PREFIX_LABEL
                    )
                    o_dt = dt.text if dt.typ == lx.IRI_ABS else self._pname(dt)
                return (o, KIND_LITERAL, o_dt, o_lang)
            if typ == lx.LITERAL_DOUBLE:
                return (tok.text, KIND_LITERAL, XSD_DOUBLE, None)
            if typ == lx.LITERAL_DECIMAL:
                return (tok.text, KIND_LITERAL, XSD_DECIMAL, None)
            if typ == lx.LITERAL_INTEGER:
                return (tok.text, KIND_LITERAL, XSD_INTEGER, None)
            if typ == lx.LITERAL_BOOLEAN:
                return (tok.text, KIND_LITERAL, XSD_BOOLEAN, None)
        if typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        raise ParseError(
            tok.line, tok.col,
            "unexpected %s in quoted triple" % lx.TOKEN_NAMES.get(typ, typ),
        )

    def _parse_quoted(self) -> tuple:
        """``<< s p o >>`` after QT_START: returns the statement-node
        term and emits its reification expansion once per document."""
        ts = self.ts
        s = self._parse_qt_term(subject=True)
        tok = ts.next()
        typ = tok.typ
        if typ == lx.IRI_ABS:
            p = (tok.text, KIND_IRI, None, None)
        elif typ == lx.IRI_REL:
            p = (self.base + tok.text, KIND_IRI, None, None)
        elif typ == lx.RDF_TYPE:
            p = (RDF_TYPE, KIND_IRI, None, None)
        elif typ == lx.PREFIX_LABEL:
            p = (self._pname(tok), KIND_IRI, None, None)
        elif typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        else:
            raise ParseError(
                tok.line, tok.col,
                "unexpected %s as quoted predicate"
                % lx.TOKEN_NAMES.get(typ, typ),
            )
        o = self._parse_qt_term(subject=False)
        ts.expect("quoted triple end", lx.QT_END)
        return self._qt.term(s, p, o, self._append_reif)

    def _emit(self) -> None:
        s = self.cur[0]
        p = self.cur[1]
        o = self.cur[2]
        self.out.append((s[0], s[1], p[0], o[0], o[1], o[2], o[3]))

    def _push(self) -> None:
        self.stack.append(list(self.cur))

    def _pop(self) -> None:
        if self.stack:
            self.cur = self.stack.pop()
        else:
            self.cur = [None, None, None, _CTX_TOP]

    def _pname(self, tok: lx.Token) -> str:
        ns = self.ns.get(tok.text)
        if ns is None:
            raise ParseError(tok.line, tok.col, "missing namespace for prefix: '%s'" % tok.text)
        suf = self.ts.expect("IRI suffix", lx.IRI_SUFFIX)
        return ns + suf.text

    # -- driver ------------------------------------------------------------

    def parse_all(self) -> list[tuple]:
        while True:
            if self.ts.peek().typ == lx.EOF:
                return self.out
            self._parse_statement()

    def _parse_statement(self) -> None:
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.PREFIX:
            label = ts.expect("prefix label", lx.PREFIX_LABEL)
            iri = ts.expect("prefix IRI", lx.IRI_ABS, lx.IRI_REL)
            self.ns[label.text] = (self.base + iri.text) if iri.typ == lx.IRI_REL else iri.text
            ts.expect("directive trailing dot", lx.DOT)
        elif typ == lx.SPARQL_PREFIX:
            label = ts.expect("prefix label", lx.PREFIX_LABEL)
            iri = ts.expect("prefix IRI", lx.IRI_ABS)
            self.ns[label.text] = iri.text
        elif typ == lx.BASE:
            iri = ts.expect("base IRI", lx.IRI_ABS, lx.IRI_REL)
            # naive concat against current base (ttl.go:121-126)
            self.base = (self.base + iri.text) if iri.typ == lx.IRI_REL else iri.text
            ts.expect("directive trailing dot", lx.DOT)
        elif typ == lx.SPARQL_BASE:
            iri = ts.expect("base IRI", lx.IRI_ABS)
            self.base = iri.text
        elif typ == lx.EOF:
            return
        else:
            ts.backup(tok)
            self._parse_triple()

    def _parse_triple(self) -> None:
        state = self._parse_subject
        while state is not None:
            state = state()

    def _parse_subject(self):
        ts = self.ts
        self._pop()
        if self.cur[0] is not None:
            return self._parse_predicate
        tok = ts.next()
        typ = tok.typ
        if typ == lx.IRI_ABS:
            self.cur[0] = (tok.text, KIND_IRI, None, None)
        elif typ == lx.IRI_REL:
            self.cur[0] = (self.base + tok.text, KIND_IRI, None, None)
        elif typ == lx.BNODE:
            self.cur[0] = (tok.text, KIND_BLANK, None, None)
        elif typ == lx.ANON_BNODE:
            self.cur[0] = self._mint_bnode()
        elif typ == lx.QT_START:
            self.cur[0] = self._parse_quoted()
        elif typ == lx.PREFIX_LABEL:
            self.cur[0] = (self._pname(tok), KIND_IRI, None, None)
        elif typ == lx.PLIST_START:
            self.cur[0] = self._mint_bnode()
            self._push()
            self.cur[3] = _CTX_LIST
        elif typ == lx.COLL_START:
            if ts.peek().typ == lx.COLL_END:
                self.cur[0] = _NIL_TERM
            else:
                self.cur[0] = self._mint_bnode()
                self._push()
                self.cur[1] = (RDF_FIRST, KIND_IRI, None, None)
                self.cur[3] = _CTX_COLL
                return self._parse_object
        elif typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        else:
            raise ParseError(
                tok.line, tok.col, "unexpected %s as subject" % lx.TOKEN_NAMES.get(typ, typ)
            )
        return self._parse_predicate

    def _parse_predicate(self):
        ts = self.ts
        if self.cur[1] is not None:
            return self._parse_object
        tok = ts.next()
        typ = tok.typ
        if typ == lx.IRI_ABS:
            self.cur[1] = (tok.text, KIND_IRI, None, None)
        elif typ == lx.IRI_REL:
            self.cur[1] = (self.base + tok.text, KIND_IRI, None, None)
        elif typ == lx.RDF_TYPE:
            self.cur[1] = (RDF_TYPE, KIND_IRI, None, None)
        elif typ == lx.PREFIX_LABEL:
            self.cur[1] = (self._pname(tok), KIND_IRI, None, None)
        elif typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        else:
            raise ParseError(
                tok.line, tok.col, "unexpected %s as predicate" % lx.TOKEN_NAMES.get(typ, typ)
            )
        return self._parse_object

    def _parse_object(self):
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.IRI_ABS:
            self.cur[2] = (tok.text, KIND_IRI, None, None)
        elif typ == lx.IRI_REL:
            self.cur[2] = (self.base + tok.text, KIND_IRI, None, None)
        elif typ == lx.BNODE:
            self.cur[2] = (tok.text, KIND_BLANK, None, None)
        elif typ == lx.ANON_BNODE:
            self.cur[2] = self._mint_bnode()
        elif typ == lx.QT_START:
            self.cur[2] = self._parse_quoted()
        elif typ in (lx.LITERAL, lx.LITERAL3):
            o, o_dt, o_lang = tok.text, XSD_STRING, None
            p = ts.peek()
            if p.typ == lx.LANG_MARKER:
                ts.next()
                lt = ts.expect("literal language", lx.LANG)
                o_lang = lt.text
                o_dt = RDF_LANG_STRING
            elif p.typ == lx.DT_MARKER:
                ts.next()
                dt = ts.expect("literal datatype", lx.IRI_ABS, lx.PREFIX_LABEL)
                o_dt = dt.text if dt.typ == lx.IRI_ABS else self._pname(dt)
            self.cur[2] = (o, KIND_LITERAL, o_dt, o_lang)
        elif typ == lx.LITERAL_DOUBLE:
            self.cur[2] = (tok.text, KIND_LITERAL, XSD_DOUBLE, None)
        elif typ == lx.LITERAL_DECIMAL:
            self.cur[2] = (tok.text, KIND_LITERAL, XSD_DECIMAL, None)
        elif typ == lx.LITERAL_INTEGER:
            self.cur[2] = (tok.text, KIND_LITERAL, XSD_INTEGER, None)
        elif typ == lx.LITERAL_BOOLEAN:
            self.cur[2] = (tok.text, KIND_LITERAL, XSD_BOOLEAN, None)
        elif typ == lx.PREFIX_LABEL:
            self.cur[2] = (self._pname(tok), KIND_IRI, None, None)
        elif typ == lx.PLIST_START:
            # blank node is object of current triple (ttl.go:376-391)
            self._push()
            self.cur[2] = self._mint_bnode()
            self._emit()
            self.cur[0] = self.cur[2]
            self.cur[1] = None
            self.cur[2] = None
            self.cur[3] = _CTX_LIST
            self._push()
            return None
        elif typ == lx.COLL_START:
            if ts.peek().typ == lx.COLL_END:
                ts.next()
                self.cur[2] = _NIL_TERM
            else:
                self._push()
                self.cur[2] = self._mint_bnode()
                self._emit()
                self.cur[0] = self.cur[2]
                self.cur[1] = (RDF_FIRST, KIND_IRI, None, None)
                self.cur[2] = None
                self.cur[3] = _CTX_COLL
                self._push()
                return None
        elif typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        else:
            raise ParseError(
                tok.line, tok.col, "unexpected %s as object" % lx.TOKEN_NAMES.get(typ, typ)
            )

        self._emit()
        return self._parse_end

    def _parse_end(self):
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.SEMICOLON:
            p = ts.peek().typ
            if p in (lx.SEMICOLON, lx.DOT):
                return self._parse_end
            if p == lx.EOF:
                raise ParseError(tok.line, tok.col, "expected triple termination, got EOF")
            self.cur[1] = None
            self.cur[2] = None
            self._push()
            return None
        if typ == lx.COMMA:
            self.cur[2] = None
            self._push()
            return None
        if typ == lx.PLIST_END:
            self._pop()
            if ts.peek().typ == lx.DOT:
                ts.next()
                return None
            if self.cur[1] is None:
                # property list was the subject
                self._push()
                return None
            return self._parse_end
        if typ == lx.COLL_END:
            # close collection: { bnode rdf:rest rdf:nil }
            self.cur[1] = (RDF_REST, KIND_IRI, None, None)
            self.cur[2] = _NIL_TERM
            self._emit()
            self._pop()
            if self.cur[1] is None:
                self._push()
                return None
            return self._parse_end
        if typ == lx.ANNOT_START:
            # RDF-star annotation: the just-emitted (s, p, o) is ALSO
            # quoted; the block's triples hang off its statement node.
            # Only legal after an object of a predicateObjectList
            # (Turtle-star grammar) — not on collection members.
            if self.cur[3] == _CTX_COLL:
                raise ParseError(
                    tok.line, tok.col,
                    "annotation block on a collection member",
                )
            qt = self._qt.term(
                self.cur[0], self.cur[1], self.cur[2], self._append_reif
            )
            self._push()  # resume point: finish the base triple after |}
            self.cur = [qt, None, None, _CTX_ANNOT]
            self._push()
            return None
        if typ == lx.ANNOT_END:
            if self.cur[3] != _CTX_ANNOT:
                raise ParseError(
                    tok.line, tok.col, "unexpected annotation end"
                )
            self._pop()
            return self._parse_end
        if typ == lx.DOT:
            if self.cur[3] == _CTX_ANNOT:
                raise ParseError(
                    tok.line, tok.col, "dot inside annotation block"
                )
            if self.cur[3] == _CTX_COLL:
                return self._parse_end
            return None
        if typ == lx.ERROR:
            raise ParseError(tok.line, tok.col, "syntax error: %s" % tok.text)
        if self.cur[3] == _CTX_COLL:
            # next collection item: chain rdf:rest to a fresh bnode
            ts.backup(tok)
            nxt = self._mint_bnode()
            self.cur[1] = (RDF_REST, KIND_IRI, None, None)
            self.cur[2] = nxt
            self._emit()
            self.cur[0] = nxt
            self.cur[2] = None
            self.cur[1] = (RDF_FIRST, KIND_IRI, None, None)
            self._push()
            return None
        raise ParseError(
            tok.line, tok.col,
            "expected triple termination, got %s" % lx.TOKEN_NAMES.get(typ, typ),
        )


def parse_turtle(text: str, base: str = "") -> list[tuple]:
    """Strict whole-document Turtle parse → list of 7-tuples."""
    return TurtleParser(text, base=base).parse_all()


class TrigParser(TurtleParser):
    """TriG = Turtle + named-graph blocks (EXCEEDS reference parity: the
    reference supports no TriG, rdf.go:14-22; grammar per W3C TriG 1.1).

    Adds ``[GRAPH] label { … }`` blocks and ``{ … }`` default-graph
    blocks; top-level plain triples land in the default graph
    (``_:defaultGraph``, matching the N-Quads decoder, decoder.go:89).
    Blank-node labels and the anonymous-bnode counter stay document-
    scoped across graphs, as the spec requires.  Emits 9-tuples
    (…, graph, graph_kind).
    """

    def __init__(self, text: str, base: str = ""):
        super().__init__(text, base=base)
        self.graph: tuple | None = None  # (lex, kind) or None = default
        self._block_depth = 0  # >0 inside { } (incl. default-graph blocks)

    def _emit(self) -> None:
        s, p, o = self.cur[0], self.cur[1], self.cur[2]
        g, g_kind = self.graph if self.graph is not None else (DEFAULT_GRAPH, KIND_BLANK)
        self.out.append((s[0], s[1], p[0], o[0], o[1], o[2], o[3], g, g_kind))

    def _append_reif(self, row: tuple) -> None:
        # a quoted triple's reification lands in the graph of the block
        # that FIRST quotes it (memo prevents re-emission elsewhere —
        # same rule as parse_nquads)
        g, g_kind = self.graph if self.graph is not None else (DEFAULT_GRAPH, KIND_BLANK)
        self.out.append(row + (g, g_kind))

    def _graph_label(self) -> tuple:
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.IRI_ABS:
            return (tok.text, KIND_IRI)
        if typ == lx.IRI_REL:
            return (self.base + tok.text, KIND_IRI)
        if typ == lx.BNODE:
            return (tok.text, KIND_BLANK)
        if typ == lx.ANON_BNODE:
            b = self._mint_bnode()
            return (b[0], KIND_BLANK)
        if typ == lx.PREFIX_LABEL:
            return (self._pname(tok), KIND_IRI)
        raise ParseError(
            tok.line, tok.col,
            "unexpected %s as graph label" % lx.TOKEN_NAMES.get(typ, typ),
        )

    def _parse_block(self, label: tuple | None) -> None:
        ts = self.ts
        prev = self.graph
        self.graph = label
        self._block_depth += 1
        while True:
            p = ts.peek()
            if p.typ == lx.BLOCK_END:
                ts.next()
                break
            if p.typ == lx.EOF:
                raise ParseError(p.line, p.col, "unterminated graph block")
            if p.typ == lx.ERROR:
                raise ParseError(p.line, p.col, "syntax error: %s" % p.text)
            self._parse_triple()
        self.graph = prev
        self._block_depth -= 1

    def _parse_statement(self) -> None:
        ts = self.ts
        tok = ts.next()
        typ = tok.typ
        if typ == lx.GRAPH_KW:
            label = self._graph_label()
            ts.expect("graph block start", lx.BLOCK_START)
            return self._parse_block(label)
        if typ == lx.BLOCK_START:
            return self._parse_block(None)
        if typ in (lx.IRI_ABS, lx.IRI_REL, lx.BNODE, lx.ANON_BNODE):
            nxt = ts.peek()
            if nxt.typ == lx.BLOCK_START:
                ts.next()
                if typ == lx.IRI_ABS:
                    label = (tok.text, KIND_IRI)
                elif typ == lx.IRI_REL:
                    label = (self.base + tok.text, KIND_IRI)
                elif typ == lx.ANON_BNODE:
                    b = self._mint_bnode()
                    label = (b[0], KIND_BLANK)
                else:
                    label = (tok.text, KIND_BLANK)
                return self._parse_block(label)
        elif typ == lx.PREFIX_LABEL:
            t2 = ts.next()
            if t2.typ == lx.IRI_SUFFIX:
                if ts.peek().typ == lx.BLOCK_START:
                    ts.next()
                    ns = self.ns.get(tok.text)
                    if ns is None:
                        raise ParseError(
                            tok.line, tok.col,
                            "missing namespace for prefix: '%s'" % tok.text,
                        )
                    return self._parse_block((ns + t2.text, KIND_IRI))
            ts.backup(t2)
        ts.backup(tok)
        super()._parse_statement()

    def _parse_end(self):
        # the '.' after the last triple of ANY graph block (named or
        # default/anonymous) is optional: wrappedGraph ::= '{' triplesBlock? '}'
        if self._block_depth > 0 and self.cur[3] == _CTX_TOP and not self.stack:
            if self.ts.peek().typ == lx.BLOCK_END:
                return None
        return super()._parse_end()


def parse_trig(text: str, base: str = "") -> list[tuple]:
    """Strict whole-document TriG parse → list of 9-tuples (quads)."""
    return TrigParser(text, base=base).parse_all()
