"""RDF/XML decoder + encoder (the reference is decode-only, rdf.go:17;
the encoder at the bottom of this module EXCEEDS parity).

Port of the reference's XML-token state machine semantics
(/root/reference/rdfxml.go:64-1252) onto Python's expat: rdf:about/ID/
nodeID/resource/datatype, parseType={Resource,Literal,Collection},
containers (rdf:li → rdf:_n), reification (rdf:ID on property elements →
+4 triples), xml:base/xml:lang scoping, property attributes, and the
reference's pragmatic base-IRI resolver.  Used per-document inside
``mapInPandas`` (document-scoped: namespace/base state spans the whole
document — SURVEY.md §4.3).

Blank nodes mint ``_:b%d`` starting at 0 (post-increment, rdfxml.go:241 —
unlike Turtle which pre-increments to start at _:b1).
"""

from __future__ import annotations

import re
from xml.parsers import expat

from rdf_spark.parsing import ParseError
from rdf_spark.terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    RDF_NS,
    RDF_LANG_STRING,
    RDF_XML_LITERAL,
    XSD_STRING,
)

XML_NS = "http://www.w3.org/XML/1998/namespace"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_SUBJECT = RDF_NS + "subject"
RDF_PREDICATE = RDF_NS + "predicate"
RDF_OBJECT = RDF_NS + "object"
RDF_STATEMENT = RDF_NS + "Statement"

_NCNAME_RE = re.compile(r"^[^\W\d][\w.\-]*$", re.UNICODE)

_SEP = "\x01"

START, END, CHARDATA = 0, 1, 2

_DISALLOWED_NODE = {
    "li", "RDF", "ID", "bagID", "about", "parseType", "resource",
    "nodeID", "aboutEach", "aboutEachPrefix",
}
_DISALLOWED_PROP = {
    "Description", "RDF", "ID", "about", "bagID", "parseType",
    "resource", "nodeID", "aboutEach", "aboutEachPrefix",
}


def _is_ln(s: str) -> bool:
    """^_[1-9]\\d*$ (isLn, rdfxml.go:1124-1143)."""
    return bool(re.match(r"^_[1-9][0-9]*$", s))


class _EOF(Exception):
    pass


def _split_name(name: str) -> tuple[str, str]:
    parts = name.split(_SEP)
    if len(parts) == 2:
        return parts[0], parts[1]
    return "", parts[0]


def _tokenize(text: str) -> list[tuple]:
    """Whole-document expat pass → Go-xml-like token list.

    Tokens: (START, space, local, attrs) with attrs [(space, local, value)],
    (END, space, local), (CHARDATA, text).  Consecutive character data is
    coalesced (Go's xml.Decoder returns one CharData per text run); xmlns
    declarations surface as attrs with space=='xmlns' on their element.
    """
    toks: list[tuple] = []
    pending_ns: list[tuple[str, str, str]] = []
    chardata: list[str] = []

    def flush_chars():
        if chardata:
            toks.append((CHARDATA, "".join(chardata)))
            chardata.clear()

    p = expat.ParserCreate(namespace_separator=_SEP)
    p.ordered_attributes = True

    def start_ns(prefix, uri):
        if prefix:  # default decls are not attrs in Go's model (attrXMLNS)
            pending_ns.append(("xmlns", prefix, uri or ""))

    def start(name, attr_list):
        flush_chars()
        space, local = _split_name(name)
        attrs = list(pending_ns)
        pending_ns.clear()
        for i in range(0, len(attr_list), 2):
            a_space, a_local = _split_name(attr_list[i])
            attrs.append((a_space, a_local, attr_list[i + 1]))
        toks.append((START, space, local, attrs))

    def end(name):
        flush_chars()
        space, local = _split_name(name)
        toks.append((END, space, local))

    def chars(data):
        chardata.append(data)

    p.StartNamespaceDeclHandler = start_ns
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars
    try:
        p.Parse(text, True)
    except expat.ExpatError as e:
        raise ParseError(getattr(e, "lineno", 0), getattr(e, "offset", 0), str(e))
    flush_chars()
    return toks


def _attr_rdf(attrs, lname):
    out = []
    for space, local, value in attrs:
        if space == RDF_NS:
            if local == lname:
                if lname in ("nodeID", "ID") and not _NCNAME_RE.match(value):
                    raise ParseError(0, 0, "rdf:%s is not a valid XML NCName: %r" % (local, value))
                out.append((space, local, value))
            elif local == "li":
                raise ParseError(0, 0, "unexpected as attribute: rdf:li")
    return out


def _attr_xml(attrs, lname):
    return [(s, l, v) for s, l, v in attrs if s == XML_NS and l == lname][:1]


def _attr_xmlns(attrs):
    return [(s, l, v) for s, l, v in attrs if s == "xmlns"]


def _attr_rest(attrs, with_ln=False):
    out = []
    for s, l, v in attrs:
        if s == RDF_NS:
            if l in ("about", "parseType", "resource", "datatype", "li", "type"):
                continue
            if l in ("ID", "nodeID"):
                if not _NCNAME_RE.match(v):
                    raise ParseError(0, 0, "rdf:%s is not a valid XML NCName: %r" % (l, v))
                continue
            if l in ("aboutEach", "aboutEachPrefix", "bagID"):
                raise ParseError(0, 0, "deprecated: rdf:%s" % l)
            if not with_ln and _is_ln(l):
                continue
            out.append((s, l, v))
            continue
        if s == XML_NS or l == "xmlns" or (not with_ln and s == ""):
            continue
        if with_ln and s == "xmlns":
            continue
        out.append((s, l, v))
    return out


class _Ctx:
    __slots__ = ("base", "subj", "lang", "li_n", "ns")

    def __init__(self, base="", subj=None, lang="", li_n=0, ns=None):
        self.base = base
        self.subj = subj
        self.lang = lang
        self.li_n = li_n
        self.ns = list(ns or [])

    def copy(self):
        return _Ctx(self.base, self.subj, self.lang, self.li_n, self.ns)


class RdfXmlParser:
    """Document parser; triples as (s, s_kind, p, o, o_kind, o_dt, o_lang)."""

    def __init__(self, text: str, base: str = ""):
        self.toks = _tokenize(text)
        self.pos = 0
        self.tok = None
        self.ns: list[tuple[str, str]] = []  # (uri, prefix) top-level pairs
        self.base = base  # restored on full context pop
        self.bnode_n = 0
        self.top_elem = None
        self.reify_id = ""
        self.dt: str | None = None
        self.lang = ""
        # current triple parts: terms are (lex, kind, dt, lang)
        self.subj = None
        self.pred = None
        self.obj = None
        self.ctx = _Ctx(base=base)
        self.ctx_stack: list[_Ctx] = []
        self.out: list[tuple] = []

    # --- plumbing -------------------------------------------------------

    def _next_tok(self):
        if self.pos >= len(self.toks):
            raise _EOF
        self.tok = self.toks[self.pos]
        self.pos += 1

    def _emit(self):
        s, p, o = self.subj, self.pred, self.obj
        self.out.append((s[0], s[1], p[0], o[0], o[1], o[2], o[3]))

    def _mint_bnode(self):
        b = ("_:b%d" % self.bnode_n, KIND_BLANK, None, None)
        self.bnode_n += 1
        return b

    def _store_prefix_ns(self, attrs):
        for _, prefix, uri in _attr_xmlns(attrs):
            self.ctx.ns.extend([(uri, prefix)])
        b = _attr_xml(attrs, "base")
        if b:
            self.ctx.base = b[0][2]

    def _push_ctx(self):
        self.ctx.subj = self.subj
        self.ctx_stack.append(self.ctx.copy())
        self.ctx.li_n = 0

    def _pop_ctx(self):
        if not self.ctx_stack:
            self.ctx = _Ctx(base=self.base)
            self.subj = None
        else:
            self.ctx = self.ctx_stack.pop()
            self.subj = self.ctx.subj

    def _get_prefix(self, ns_uri):
        for uri, prefix in self.ctx.ns:
            if uri == ns_uri:
                return prefix
        for uri, prefix in self.ns:
            if uri == ns_uri:
                return prefix
        raise ParseError(0, 0, "no prefix found for name space: %r" % ns_uri)

    def _get_ns(self, prefix):
        for uri, pfx in self.ctx.ns:
            if pfx == prefix:
                return uri
        for uri, pfx in self.ns:
            if pfx == prefix:
                return uri
        raise ParseError(0, 0, "no name space found for prefix: %r" % prefix)

    # --- IRI resolution (resolve, rdfxml.go:983-1122) --------------------

    def _resolve(self, base: str, path: str) -> str:
        i = 0
        for i, ch in enumerate(path):
            if ch == ":":
                rest = path[i + 1 :]
                if rest.startswith("//"):
                    return path
                if i + 1 < len(path):
                    try:
                        return self._get_ns(path[:i]) + rest
                    except ParseError:
                        # DEVIATION: the reference QName-resolves ANY
                        # prefix:suffix here (rdfxml.go:992-996), which
                        # makes non-hierarchical absolute IRIs (urn:...,
                        # mailto:...) undecodable in rdf:about/resource.
                        # When the prefix is unbound but a valid URI
                        # scheme, treat the value as the absolute IRI the
                        # RDF/XML spec says it is.
                        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*$", path[:i]):
                            return path
                        raise
                break
        if not base:
            return path
        if not path:
            return base[: _frag_idx(base)]
        c0 = path[0]
        if c0 == "#":
            return base[: _frag_idx(base)] + path
        if c0 == "/":
            if len(path) > 1 and path[1] == "/":
                return base[: _scheme_end(base)] + path
            return base[: _host_end(base)] + path
        if c0 == ".":
            n_levels = len(path.split("../"))
            return base[: _slash_idx(base, n_levels)] + path.lstrip("./")
        i = _last_slash_idx(base)
        if i == 0 or base[i - 1] != "/":
            return base + "/" + path
        return base[:i] + path

    # --- object literals --------------------------------------------------

    def _obj_literal(self, data: str):
        if self.dt is not None:
            # explicit datatype wins; lang only kept for rdf:langString
            # (Literal.Serialize precedence, rdf.go:260-269)
            lang = self.lang if self.dt == RDF_LANG_STRING and self.lang else None
            self.obj = (data, KIND_LITERAL, self.dt, lang)
            self.dt = None
        elif self.lang:
            self.obj = (data, KIND_LITERAL, RDF_LANG_STRING, self.lang)
        elif self.ctx.lang:
            self.obj = (data, KIND_LITERAL, RDF_LANG_STRING, self.ctx.lang)
        else:
            self.obj = (data, KIND_LITERAL, XSD_STRING, None)

    def _reify_check(self):
        if self.reify_id:
            iri = self._resolve(self.ctx.base, self.reify_id)
            self.out.append((iri, KIND_IRI, RDF_TYPE, RDF_STATEMENT, KIND_IRI, None, None))
            s = self.subj
            self.out.append((iri, KIND_IRI, RDF_SUBJECT, s[0], s[1], None, None))
            p = self.pred
            self.out.append((iri, KIND_IRI, RDF_PREDICATE, p[0], KIND_IRI, None, None))
            o = self.obj
            self.out.append((iri, KIND_IRI, RDF_OBJECT, o[0], o[1], o[2], o[3]))
            self.reify_id = ""

    # --- driver -----------------------------------------------------------

    def parse_all(self) -> list[tuple]:
        state = self._st_top_elem
        next_state = [self._st_top_elem]

        while True:
            try:
                self._next_tok()
                state = next_state[0]
                if state is None:
                    return self.out
                while state is not None:
                    state = state(next_state)
            except _EOF:
                # mirrors the reference's panic(io.EOF) → recover → io.EOF
                # (graceful end even mid-state, rdfxml.go:975-981)
                return self.out

    # Each state fn takes `next_state` (1-slot list: which state to resume
    # in after re-fetching a token at the driver level) and returns the next
    # in-line state or None to yield back to the driver.

    def _st_top_elem(self, nxt):
        kind = self.tok[0]
        if kind == START:
            _, space, local, attrs = self.tok
            self.top_elem = space + local
            self._store_prefix_ns(attrs)
            b = _attr_xml(attrs, "base")
            if b:
                self.base = b[0][2]
            for _, prefix, uri in _attr_xmlns(attrs):
                self.ns.append((uri, prefix))
            if space != RDF_NS or local != "RDF":
                return self._st_node_elem
            self._next_tok()
            return self._st_node_elem
        self._next_tok()
        return self._st_top_elem

    def _st_node_elem(self, nxt):
        kind = self.tok[0]
        if kind == START:
            _, space, local, attrs = self.tok
            if space == RDF_NS:
                if local == "Description":
                    self._store_prefix_ns(attrs)
                    a = _attr_rdf(attrs, "about")
                    if a:
                        self.subj = (self._resolve(self.ctx.base, a[0][2]), KIND_IRI, None, None)
                    aid = _attr_rdf(attrs, "ID")
                    if aid:
                        if _attr_rdf(attrs, "nodeID"):
                            raise ParseError(0, 0, "A node element cannot have both rdf:ID and rdf:nodeID")
                        self.subj = (self._resolve(self.ctx.base, "#" + aid[0][2]), KIND_IRI, None, None)
                    anid = _attr_rdf(attrs, "nodeID")
                    if anid:
                        if a:
                            raise ParseError(0, 0, "A node element cannot have both rdf:about and rdf:nodeID")
                        self.subj = ("_:" + anid[0][2], KIND_BLANK, None, None)
                    at = _attr_rdf(attrs, "type")
                    if at:
                        self.pred = (RDF_TYPE, KIND_IRI, None, None)
                        self.obj = (self._resolve(self.ctx.base, at[0][2]), KIND_IRI, None, None)
                        self._emit()
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    lng = _attr_xml(attrs, "lang")
                    if lng:
                        self.ctx.lang = lng[0][2]
                    if not attrs or self.subj is None:
                        self.subj = self._mint_bnode()
                    rest = _attr_rest(attrs)
                    if rest:
                        for s_, l_, v_ in rest:
                            self.pred = (s_ + l_, KIND_IRI, None, None)
                            self._obj_literal(v_)
                            self._emit()
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    self._next_tok()
                    return self._st_prop_elem
                if local in ("Bag", "Seq", "Alt"):
                    self._store_prefix_ns(attrs)
                    self._push_ctx()
                    # containers take the typed-node path that follows
                elif local in _DISALLOWED_NODE:
                    raise ParseError(0, 0, "disallowed as node element name: rdf:%s" % local)
                # other rdf: locals fall through as typed node elements

            a = _attr_rdf(attrs, "about")
            if a:
                self.subj = (self._resolve(self.ctx.base, a[0][2]), KIND_IRI, None, None)
            aid = _attr_rdf(attrs, "ID")
            if aid:
                self.subj = (self._resolve(self.ctx.base, "#" + aid[0][2]), KIND_IRI, None, None)
            if self.subj is None:
                self.subj = self._mint_bnode()
            self.pred = (RDF_TYPE, KIND_IRI, None, None)
            self.obj = (space + local, KIND_IRI, None, None)
            self._emit()
            rest = _attr_rest(attrs, with_ln=True)
            for s_, l_, v_ in rest:
                self.pred = (s_ + l_, KIND_IRI, None, None)
                self._obj_literal(v_)
                self._emit()
            nxt[0] = self._st_prop_or_node_end
            return None
        if kind == END:
            _, space, local = self.tok
            if space + local == self.top_elem:
                nxt[0] = None
                return None
            raise ParseError(0, 0, "unexpected closing tag: %s%s" % (space, local))
        self._next_tok()
        return self._st_node_elem

    def _st_prop_or_node_end(self, nxt):
        kind = self.tok[0]
        if kind == START:
            _, space, local, attrs = self.tok
            if space == RDF_NS and (local == "li" or _is_ln(local)):
                return self._st_prop_elem
            if not attrs:
                self.pred = (space + local, KIND_IRI, None, None)
                self._next_tok()
                return self._st_chardata_or_node
            return self._st_prop_elem
        if kind == END:
            self._pop_ctx()
            self._next_tok()
            if self.subj is not None:
                return self._st_prop_or_node_end
            return self._st_node_elem
        self._next_tok()
        return self._st_prop_or_node_end

    def _st_chardata_or_node(self, nxt):
        char_data = ""
        # first: (parseXMLCharDataOrElemNode rdfxml.go:383-432)
        while True:
            kind = self.tok[0]
            if kind == CHARDATA:
                char_data = self.tok[1]
                break
            if kind == START:
                _, space, local, attrs = self.tok
                self._push_ctx()
                self._push_ctx()
                if space == RDF_NS and local == "Description":
                    if not attrs:
                        self.obj = self._mint_bnode()
                        self._emit()
                        self.subj = self.obj
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    break  # reference falls through to `second` (next token)
                raise ParseError(0, 0, "unsupported node element in object position: %s%s" % (space, local))
            if kind == END:
                self._obj_literal("")
                self._emit()
                self._reify_check()
                # clear the in-scope xml:lang, as _st_prop_elem_end does for
                # non-empty literals.  DEVIATION: the reference skips this
                # for the empty-literal path (rdfxml.go:418-428), leaking a
                # property element's xml:lang onto its SIBLINGS — xml:lang
                # scopes to the element subtree, so we clear it (the W3C
                # suite doesn't pin the buggy behavior; encoder round-trips
                # depend on the correct one).
                self.lang = ""
                nxt[0] = self._st_prop_or_node_end
                return None
            self._next_tok()

        self._next_tok()

        # second: (rdfxml.go:436-520)
        while True:
            kind = self.tok[0]
            if kind == START:
                _, space, local, attrs = self.tok
                if space == RDF_NS and local == "Description":
                    self._push_ctx()
                    self._push_ctx()
                    self._store_prefix_ns(attrs)
                    rest = _attr_rest(attrs)
                    if rest:
                        self.obj = self._mint_bnode()
                        self._emit()
                        self._reify_check()
                        self.subj = self.obj
                        for s_, l_, v_ in rest:
                            self.pred = (s_ + l_, KIND_IRI, None, None)
                            self._obj_literal(v_)
                            self._emit()
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    anid = _attr_rdf(attrs, "nodeID")
                    if anid:
                        self.obj = ("_:" + anid[0][2], KIND_BLANK, None, None)
                        self._emit()
                        self._reify_check()
                        self.subj = self.obj
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    self.obj = self._mint_bnode()
                    self._emit()
                    self._reify_check()
                    self.subj = self.obj
                    nxt[0] = self._st_prop_or_node_end
                    return None
                else:
                    self._push_ctx()
                    self._push_ctx()
                    a = _attr_rdf(attrs, "about")
                    if a:
                        self.obj = (a[0][2], KIND_IRI, None, None)
                        self._emit()
                        self.subj = self.obj
                        nxt[0] = self._st_prop_or_node_end
                        return None
                    raise ParseError(0, 0, "unsupported object node element: %s%s" % (space, local))
            if kind == END:
                self._obj_literal(char_data)
                self._emit()
                nxt[0] = self._st_prop_or_node_end
                return self._st_prop_elem_end
            self._next_tok()

    def _st_prop_elem_end(self, nxt):
        kind = self.tok[0]
        if kind == END:
            self._reify_check()
            self.lang = ""
            return None
        if kind == CHARDATA:
            self._next_tok()
            return self._st_prop_elem_end
        raise ParseError(0, 0, "unexpected XML token in property element end")

    def _st_prop_elem(self, nxt):
        kind = self.tok[0]
        if kind == START:
            _, space, local, attrs = self.tok
            self._store_prefix_ns(attrs)
            if space == RDF_NS:
                if local == "li":
                    self.ctx.li_n += 1
                    self.pred = (RDF_NS + "_%d" % self.ctx.li_n, KIND_IRI, None, None)
                elif local in _DISALLOWED_PROP:
                    raise ParseError(0, 0, "disallowed as property element name: rdf:%s" % local)
                else:
                    self.pred = (space + local, KIND_IRI, None, None)
            else:
                self.pred = (space + local, KIND_IRI, None, None)

            aid = _attr_rdf(attrs, "ID")
            if aid:
                self.reify_id = "#" + aid[0][2]

            apt = _attr_rdf(attrs, "parseType")
            if apt:
                v = apt[0][2]
                if v == "Resource":
                    self.obj = self._mint_bnode()
                    self._emit()
                    self._reify_check()
                    self._push_ctx()
                    self.subj = self.obj
                    self._next_tok()
                    return self._st_prop_or_node_end
                if v == "Collection":
                    return self._st_collection
                if _attr_rdf(attrs, "resource"):
                    raise ParseError(0, 0, 'cannot have both rdf:parseType="Literal" and rdf:resource')
                self._parse_xml_literal(space + local)
                self._emit()
                nxt[0] = self._st_prop_or_node_end
                return None

            ares = _attr_rdf(attrs, "resource")
            if ares:
                if _attr_rdf(attrs, "nodeID"):
                    raise ParseError(0, 0, "A property element cannot have both rdf:resource and rdf:nodeID")
                self.obj = (self._resolve(self.ctx.base, ares[0][2]), KIND_IRI, None, None)
                self._emit()
                self._reify_check()
                rest = _attr_rest(attrs)
                if rest:
                    self._push_ctx()
                    self.subj = self.obj
                    for s_, l_, v_ in rest:
                        self.pred = (s_ + l_, KIND_IRI, None, None)
                        self._obj_literal(v_)
                        self._emit()
                    self._pop_ctx()
                self._next_tok()
                nxt[0] = self._st_prop_or_node_end
                return self._st_prop_elem_end

            anid = _attr_rdf(attrs, "nodeID")
            if anid:
                self.obj = ("_:" + anid[0][2], KIND_BLANK, None, None)
                self._emit()
                self._reify_check()
                self._push_ctx()
                nxt[0] = self._st_prop_or_node_end
                return None

            adt = _attr_rdf(attrs, "datatype")
            if adt:
                self.dt = self._resolve(self.ctx.base, adt[0][2])
            else:
                lng = _attr_xml(attrs, "lang")
                if lng:
                    self.lang = lng[0][2]

            rest = _attr_rest(attrs)
            if rest:
                self.obj = self._mint_bnode()
                self._emit()
                self._push_ctx()
                self._reify_check()
                self.subj = self.obj
                for s_, l_, v_ in rest:
                    self.pred = (s_ + l_, KIND_IRI, None, None)
                    self._obj_literal(v_)
                    self._emit()
                nxt[0] = self._st_prop_or_node_end
                return None

            self._next_tok()
            return self._st_chardata_or_node
        if kind == END:
            return self._st_prop_or_node_end
        self._next_tok()
        return self._st_prop_elem

    def _st_collection(self, nxt):
        self.obj = self._mint_bnode()
        self._emit()
        self.subj = self.obj
        _, space, local, _attrs = self.tok
        tag = space + local
        first = True
        while True:
            self._next_tok()
            kind = self.tok[0]
            if kind == START:
                _, s_, l_, attrs = self.tok
                if s_ == RDF_NS and l_ == "Description":
                    a = _attr_rdf(attrs, "about")
                    if a:
                        if first:
                            self.pred = (RDF_FIRST, KIND_IRI, None, None)
                            self.obj = (a[0][2], KIND_IRI, None, None)
                            self._emit()
                            first = False
                        else:
                            self.pred = (RDF_REST, KIND_IRI, None, None)
                            self.obj = self._mint_bnode()
                            self._emit()
                            self.subj = self.obj
                            self.pred = (RDF_FIRST, KIND_IRI, None, None)
                            self.obj = (a[0][2], KIND_IRI, None, None)
                            self._emit()
                    else:
                        raise ParseError(0, 0, "collection item without rdf:about")
                else:
                    raise ParseError(0, 0, "collection item not rdf:Description")
            elif kind == END:
                _, s_, l_ = self.tok
                if s_ + l_ == tag:
                    break
        self.pred = (RDF_REST, KIND_IRI, None, None)
        self.obj = (RDF_NIL, KIND_IRI, None, None)
        self._emit()
        return None

    def _parse_xml_literal(self, cur_tok: str):
        """parseType="Literal": serialize inner tokens as a self-contained
        XML string (parseXMLLiteral, rdfxml.go:777-847)."""
        buf: list[str] = []
        prefixes: set[str] = set()
        while True:
            self._next_tok()
            kind = self.tok[0]
            if kind == START:
                _, space, local, attrs = self.tok
                buf.append("<")
                if space:
                    pfx = self._get_prefix(space)
                    buf.append(pfx + ":" + local)
                    if space not in prefixes:
                        buf.append(' xmlns:%s="%s"' % (pfx, space))
                        prefixes.add(space)
                else:
                    buf.append(local)
                for s_, l_, v_ in attrs:
                    buf.append(" ")
                    if s_ == "xmlns":
                        buf.append("xmlns:" + l_)
                    elif s_:
                        pfx = self._get_prefix(s_)
                        buf.append(pfx + ":" + l_)
                        if s_ not in prefixes:
                            buf.append(' xmlns:%s="%s"' % (pfx, s_))
                            prefixes.add(s_)
                    else:
                        buf.append(l_)
                    buf.append('="%s"' % v_)
                buf.append(">")
            elif kind == END:
                _, space, local = self.tok
                if space + local == cur_tok:
                    break
                buf.append("</")
                if space:
                    buf.append(self._get_prefix(space) + ":")
                buf.append(local)
                buf.append(">")
            elif kind == CHARDATA:
                buf.append(self.tok[1])
        self.obj = ("".join(buf), KIND_LITERAL, RDF_XML_LITERAL, None)


# --- IRI helper index fns (rdfxml.go:1025-1122) ----------------------------


def _frag_idx(s: str) -> int:
    i = len(s)
    while i > 0:
        i -= 1
        if s[i] == "#":
            return i
        if s[i] == "/":
            break
    return len(s)


def _host_end(s: str) -> int:
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        i += 1
        if ch == ".":
            while i < n and s[i].isascii() and s[i].isalpha():
                i += 1
            if i >= n:
                return i
            if s[i] == "/":
                return i
    return i


def _scheme_end(s: str) -> int:
    if s.startswith("http://"):
        return 5
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        i += 1
        if ch == ":" and i + 2 < n and s[i] == "/" and s[i + 1] == "/":
            return i
    return i


def _last_slash_idx(s: str) -> int:
    i = len(s)
    while i > 0:
        i -= 1
        if s[i] == "/":
            if i > 0 and s[i - 1] == "/":
                return len(s)
            return i + 1
    return 0


def _slash_idx(s: str, n: int) -> int:
    c = 0
    i = len(s)
    while i > 0:
        i -= 1
        if s[i] == "/":
            if i > 0 and s[i - 1] == "/":
                return i + 1
            c += 1
            if c == n:
                return i + 1
    return i


def parse_rdfxml(text: str, base: str = "") -> list[tuple]:
    """Strict whole-document RDF/XML parse → list of 7-tuples."""
    return RdfXmlParser(text, base=base).parse_all()


# ---------------------------------------------------------------------------
# RDF/XML encoder (EXCEEDS reference parity: knakk/rdf is decode-only for
# RDF/XML, rdf.go:14-22).  rdf:Description per subject, property elements
# with rdf:resource / rdf:nodeID / rdf:datatype / xml:lang.
# ---------------------------------------------------------------------------

_ENC_NCNAME_SUFFIX_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")
_ENC_NCNAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")
# XML 1.0 cannot represent most C0 control characters at all
_XML_BAD_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")


def _split_predicate_xml(iri: str) -> tuple[str, str]:
    """Split a predicate IRI into (namespace, NCName local) for use as an
    XML element name — the longest valid-NCName suffix becomes the local
    part.  Raises ParseError when no split exists (a genuine RDF/XML
    limitation: such graphs must go to NT/Turtle/TriG instead)."""
    m = _ENC_NCNAME_SUFFIX_RE.search(iri)
    if m is None or m.start() == 0:
        raise ParseError(0, 0, "predicate %r has no XML-serializable local name" % iri)
    return iri[: m.start()], iri[m.start():]


def _xml_text(s: str) -> str:
    if _XML_BAD_RE.search(s):
        raise ParseError(0, 0, "literal contains characters XML 1.0 cannot encode")
    # \r MUST go out as a character reference: XML line-ending
    # normalization would silently rewrite a raw \r to \n on parse
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\r", "&#13;")
    )


def _xml_attr(s: str) -> str:
    # \t/\n also need references in attributes (attribute-value
    # normalization turns raw ones into spaces)
    return (
        _xml_text(s).replace('"', "&quot;")
        .replace("\n", "&#10;").replace("\t", "&#9;")
    )


def encode_rdfxml_pdf(pdf, namespaces: dict | None = None) -> str:
    """Encode a pandas batch of triples into one RDF/XML document.

    Subjects group into ``rdf:Description`` blocks (``rdf:about`` for
    IRIs, ``rdf:nodeID`` for blanks — labels must be NCNames; run
    skolemize first for arbitrary labels).  Predicate namespaces are
    compressed to ``ns%d`` prefixes like the Turtle encoder (a caller map
    ``{namespace-iri: prefix}`` is honored first).  Round-trips through
    :func:`parse_rdfxml`.
    """
    custom = dict(namespaces or {})
    # the header hard-declares xmlns:rdf; a redundant RDF_NS→"rdf" entry is
    # dropped (prefix_of then resolves it without re-declaring), any other
    # use of the 'rdf' prefix or a duplicate prefix would emit duplicate
    # xmlns attributes = unparseable XML
    if custom.get(RDF_NS) == "rdf":
        del custom[RDF_NS]
    if "rdf" in custom.values():
        raise ParseError(0, 0, "prefix 'rdf' is reserved for the RDF namespace")
    if len(set(custom.values())) != len(custom):
        raise ParseError(0, 0, "duplicate prefixes in the namespaces map")
    taken = set(custom.values()) | {"rdf"}
    rows = sorted(
        pdf[["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]]
        .itertuples(index=False),
        key=lambda r: (r[1], r[0], r[2], str(r[3])),
    )
    # pre-seed the header's hard declaration so rdf-namespace predicates
    # (rdf:type, rdf:first, ...) reuse 'rdf' instead of minting ns%d
    ns: dict[str, str] = {RDF_NS: "rdf"}
    counter = [0]

    def prefix_of(ns_iri: str) -> str:
        p = ns.get(ns_iri)
        if p is None:
            p = custom.get(ns_iri)
            if p is None:
                # generated names must never collide with caller prefixes
                # (duplicate xmlns attributes = unparseable XML)
                while ("ns%d" % counter[0]) in taken:
                    counter[0] += 1
                p = "ns%d" % counter[0]
                counter[0] += 1
            ns[ns_iri] = p
        return p

    body: list[str] = []
    cur_subj = None
    from rdf_spark.terms import XSD_STRING

    for s, s_kind, p, o, o_kind, o_dt, o_lang in rows:
        pred_ns, local = _split_predicate_xml(p)
        pfx = prefix_of(pred_ns)
        if (s, s_kind) != cur_subj:
            if cur_subj is not None:
                body.append("  </rdf:Description>\n")
            if s_kind == 0 and s.startswith("_:"):
                label = s[2:]
                if not _ENC_NCNAME_RE.match(label):
                    raise ParseError(
                        0, 0, "blank label %r is not an NCName; skolemize first" % s
                    )
                body.append('  <rdf:Description rdf:nodeID="%s">\n' % _xml_attr(label))
            else:
                # IRIs, incl. skolemized blanks (kind 0 with an IRI lexical,
                # SURVEY §1.4) — same dispatch as the NT/Turtle encoders
                body.append('  <rdf:Description rdf:about="%s">\n' % _xml_attr(s))
            cur_subj = (s, s_kind)
        if o_kind == 1:
            body.append('    <%s:%s rdf:resource="%s"/>\n' % (pfx, local, _xml_attr(o)))
        elif o_kind == 0 and o.startswith("_:"):
            label = o[2:]
            if not _ENC_NCNAME_RE.match(label):
                raise ParseError(
                    0, 0, "blank label %r is not an NCName; skolemize first" % o
                )
            body.append('    <%s:%s rdf:nodeID="%s"/>\n' % (pfx, local, _xml_attr(label)))
        elif o_kind == 0:
            # skolemized blank: IRI lexical → rdf:resource
            body.append('    <%s:%s rdf:resource="%s"/>\n' % (pfx, local, _xml_attr(o)))
        else:
            attrs = ""
            if o_lang:
                attrs = ' xml:lang="%s"' % _xml_attr(o_lang)
            elif o_dt and o_dt != XSD_STRING:
                attrs = ' rdf:datatype="%s"' % _xml_attr(o_dt)
            body.append(
                "    <%s:%s%s>%s</%s:%s>\n" % (pfx, local, attrs, _xml_text(o), pfx, local)
            )
    if cur_subj is not None:
        body.append("  </rdf:Description>\n")

    decls = "".join(
        ' xmlns:%s="%s"' % (pfx, _xml_attr(ns_iri))
        for ns_iri, pfx in ns.items()
        if pfx != "rdf"  # the header already declares xmlns:rdf
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"%s>\n'
        "%s</rdf:RDF>\n" % (decls, "".join(body))
    )
