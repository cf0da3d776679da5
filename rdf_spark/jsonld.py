"""JSON-LD decoder/encoder — a documented core subset (EXCEEDS reference
parity: knakk/rdf supports no JSON-LD, /root/reference/rdf.go:14-22).

Scope (JSON-LD 1.0 core, local documents only):

* inline ``@context``: term → IRI string, term → ``{"@id", "@type"}``
  (``"@id"`` coercion or a datatype IRI), ``@vocab``, ``@base``,
  ``@language``; compact IRIs (``prefix:suffix``) resolved through the
  context.  REMOTE contexts (URL strings) are rejected with ParseError —
  a 10^12-document job must never do per-document network I/O.
* node objects: ``@id`` (IRI / ``_:label`` / relative → base), ``@type``
  (string or list), property values: JSON scalars, ``@value`` objects
  (with ``@language`` / ``@type``), ``{"@id": ...}`` references, nested
  node objects (minted ``_:bN`` per document, same counter convention as
  the Turtle parser), ``@list`` (rdf:first/rest/nil chains), arrays.
* ``@graph``: top-level default graph array, and named graphs via node
  objects carrying both ``@id`` and ``@graph``.

Keyword matrix — the full JSON-LD 1.0/1.1 keyword inventory vs this
core subset (every row is covered by tests/test_jsonld.py):

==============  ===========  ==================================================
keyword         status       behavior
==============  ===========  ==================================================
``@context``    supported    inline objects/arrays only; a remote URL
                             context string raises ParseError (no per-doc
                             network I/O); ``null`` term defs remove terms
``@id``         supported    IRI / ``_:label`` / relative (resolved against
                             ``@base``); ``"@type": "@id"`` coercion
``@type``       supported    node types → rdf:type; datatype in term defs
                             and ``@value`` objects
``@value``      supported    with ``@language`` xor ``@type``
``@language``   supported    context default + ``@value`` objects + term defs
``@list``       supported    value objects and ``"@container": "@list"``
``@graph``      supported    top-level default-graph array; named graphs via
                             nodes carrying both ``@id`` and ``@graph``
``@vocab``      supported    string IRI
``@base``       supported    string IRI; naive-concat resolution (C3 parity)
``@container``  partial      ``"@list"`` and ``"@set"`` (a no-op for RDF
                             conversion, like ``{"@set": […]}`` value
                             objects — identical triples to the bare
                             array); ``@index``/``@language``/``@id``/
                             ``@type`` maps raise
``@index``      rejected*    ParseError in node objects / term defs;
                             *ignored* inside ``@value`` objects (spec:
                             pure metadata there)
``@reverse``    rejected     ParseError (node objects and term defs)
``@nest``       rejected     ParseError
``@included``   rejected     ParseError
``@json``       rejected     ParseError (no JSON literals) — as a ``@value``
                             datatype, a term-def coercion, or a node key
``@direction``  rejected     ParseError
``@version``,   rejected     ParseError via the ``@context`` keyword guard
``@prefix``,
``@propagate``,
``@protected``,
``@import``
aliasing        rejected     a term expanding to a keyword (e.g.
                             ``{"id": "@id"}`` used as a node key) raises
                             instead of emitting a junk ``@id`` predicate
``@none``       rejected     only meaningful inside container maps, which
                             are themselves rejected
==============  ===========  ==================================================

Scalar → literal mapping follows NewLiteral's spirit (rdf.go:342-359):
bool → xsd:boolean ("true"/"false"), int → xsd:integer, float →
xsd:double (repr lexical), str → xsd:string (or the context/value
language → rdf:langString).

Output rows are 9-tuples in the quad schema (graph ``_:defaultGraph``
when unnamed, matching decoder.go:89).
"""

from __future__ import annotations

import json
import re

from rdf_spark.parsing import ParseError
from rdf_spark.terms import (
    DEFAULT_GRAPH,
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    RDF_FIRST,
    RDF_LANG_STRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

_KEYWORDS = {"@context", "@id", "@type", "@value", "@language", "@list",
             "@graph", "@vocab", "@base"}
_UNSUPPORTED = {"@reverse", "@index", "@container", "@nest", "@included",
                "@json", "@direction"}
_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _err(msg: str) -> ParseError:
    return ParseError(0, 0, msg)


class _Context:
    def __init__(self, base: str):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base = base
        self.language: str | None = None

    def load(self, ctx) -> None:
        if ctx is None:
            return
        if isinstance(ctx, list):
            for c in ctx:
                self.load(c)
            return
        if isinstance(ctx, str):
            raise _err("remote @context not supported: %r" % ctx)
        if not isinstance(ctx, dict):
            raise _err("invalid @context")
        for term, defn in ctx.items():
            if term == "@vocab":
                if defn is not None and not isinstance(defn, str):
                    raise _err("@vocab must be a string")
                self.vocab = defn
            elif term == "@base":
                if defn is not None and not isinstance(defn, str):
                    raise _err("@base must be a string")
                self.base = defn if defn is not None else ""
            elif term == "@language":
                if defn is not None and not isinstance(defn, str):
                    raise _err("@language must be a string")
                self.language = defn
            elif term.startswith("@"):
                raise _err("unsupported @context keyword: %s" % term)
            elif isinstance(defn, str):
                self.terms[term] = {"@id": defn}
            elif isinstance(defn, dict):
                bad = set(defn) & (_UNSUPPORTED - {"@container"})
                if bad:
                    raise _err("unsupported term definition keyword: %s" % bad.pop())
                if "@container" in defn and defn["@container"] not in (
                    "@list", "@set",
                ):
                    raise _err(
                        "unsupported @container: %r (only @list/@set)"
                        % defn["@container"]
                    )
                self.terms[term] = defn
            elif defn is None:
                self.terms.pop(term, None)
            else:
                raise _err("invalid term definition for %r" % term)

    def expand_iri(self, value: str, vocab: bool = False,
                   _seen: frozenset = frozenset()) -> str | None:
        """Term / compact-IRI / IRI expansion (None = drop: not resolvable).

        ``_seen`` guards term-definition cycles ({"x": "x"} or a→b→a):
        they raise ParseError instead of exhausting the Python stack.
        """
        if not isinstance(value, str):
            raise _err("expected an IRI/term string, got %s" % type(value).__name__)
        if value.startswith("@"):
            return value
        t = self.terms.get(value)
        if t is not None:
            if value in _seen:
                raise _err("cyclic @context term definition: %r" % value)
            iri = t.get("@id")
            if iri is None:
                return None
            return self.expand_iri(iri, vocab=True, _seen=_seen | {value})
        if value.startswith("_:"):
            return value
        if ":" in value:
            prefix, rest = value.split(":", 1)
            if not rest.startswith("//"):
                p = self.terms.get(prefix)
                if p is not None and "@id" in p:
                    if prefix in _seen:
                        raise _err("cyclic @context term definition: %r" % prefix)
                    ns = self.expand_iri(p["@id"], vocab=True, _seen=_seen | {prefix})
                    if ns is None:
                        raise _err("prefix %r does not expand to an IRI" % prefix)
                    return ns + rest
            if _ABS_IRI_RE.match(value):
                return value
        if vocab and self.vocab:
            return self.vocab + value
        if not vocab and self.base:
            return self.base + value  # naive concat, same as TurtleParser (C3)
        if _ABS_IRI_RE.match(value):
            return value
        return None if vocab else value


class JsonLdParser:
    def __init__(self, text: str, base: str = ""):
        self.text = text
        self.base = base
        self.bnode_n = 0
        self.out: list[tuple] = []

    def _mint(self) -> tuple:
        self.bnode_n += 1
        return ("_:b%d" % self.bnode_n, KIND_BLANK)

    def parse_all(self) -> list[tuple]:
        try:
            doc = json.loads(self.text)
        except json.JSONDecodeError as e:
            raise ParseError(e.lineno, e.colno, "invalid JSON: %s" % e.msg)
        ctx = _Context(self.base)
        default_g = (DEFAULT_GRAPH, KIND_BLANK)
        self._node_or_array(doc, ctx, default_g)
        return self.out

    # -- helpers -----------------------------------------------------------

    def _node_or_array(self, doc, ctx: _Context, graph: tuple) -> None:
        if isinstance(doc, list):
            for item in doc:
                self._node_or_array(item, ctx, graph)
            return
        if not isinstance(doc, dict):
            raise _err("top-level JSON-LD value must be an object or array")
        self._node(doc, ctx, graph)

    def _subject_of(self, node: dict, ctx: _Context) -> tuple:
        nid = node.get("@id")
        if nid is None:
            return self._mint()
        if not isinstance(nid, str):
            raise _err("@id must be a string")
        if nid.startswith("_:"):
            return (nid, KIND_BLANK)
        iri = ctx.expand_iri(nid)
        if iri is None:
            raise _err("cannot expand @id: %r" % nid)
        return (iri, KIND_IRI)

    def _node(self, node: dict, ctx: _Context, graph: tuple) -> tuple:
        """Emit the node's triples; return its (subject, kind)."""
        if "@context" in node:
            # child contexts inherit the parent's terms (shallow clone)
            ctx = self._clone_ctx_with(node["@context"], ctx)
        bad = set(node) & _UNSUPPORTED
        if bad:
            raise _err("unsupported keyword: %s" % bad.pop())

        subj = self._subject_of(node, ctx)

        if "@graph" in node:
            g = subj if "@id" in node else graph
            self._node_or_array(node["@graph"], ctx, g)

        types = node.get("@type", [])
        if isinstance(types, str):
            types = [types]
        if not isinstance(types, list):
            raise _err("@type must be a string or array of strings")
        for t in types:
            if not isinstance(t, str):
                raise _err("@type entries must be strings")
            iri = ctx.expand_iri(t, vocab=True)
            if iri is None or iri.startswith("@"):
                raise _err("cannot expand @type: %r" % t)
            self._emit(subj, RDF_TYPE, (iri, KIND_IRI, None, None), graph)

        for key, value in node.items():
            if key in ("@context", "@id", "@type", "@graph"):
                continue
            if key.startswith("@"):
                raise _err("unexpected keyword in node object: %s" % key)
            pred = ctx.expand_iri(key, vocab=True)
            if pred is None:
                continue  # term not defined and no @vocab: dropped (spec)
            if pred.startswith("@"):
                raise _err("keyword aliasing is unsupported (term %r → %s)"
                           % (key, pred))
            tdef = ctx.terms.get(key, {})
            for obj in self._values(value, ctx, graph, tdef):
                self._emit(subj, pred, obj, graph)
        return subj

    def _clone_ctx_with(self, ctx_value, parent: _Context) -> _Context:
        child = _Context(parent.base)
        child.terms = dict(parent.terms)
        child.vocab = parent.vocab
        child.language = parent.language
        child.load(ctx_value)
        return child

    def _values(self, value, ctx: _Context, graph: tuple, tdef: dict):
        """Yield object terms (lex, kind, datatype, lang) for a property value."""
        if isinstance(value, list):
            if tdef.get("@container") == "@list":
                yield self._list(value, ctx, graph, tdef)
                return
            for v in value:
                yield from self._values(v, ctx, graph, tdef)
            return
        if isinstance(value, dict):
            if "@set" in value:
                # {"@set": [...]} is pure syntax: identical to the bare
                # array (sets are the default RDF multi-value semantics);
                # @index alongside is metadata (dropped, like in @value)
                extra = set(value) - {"@set", "@index"}
                if extra:
                    raise _err(
                        "unsupported keyword in set object: %s" % extra.pop()
                    )
                yield from self._values(value["@set"], ctx, graph, tdef)
                return
            if "@list" in value:
                yield self._list(value["@list"], ctx, graph, tdef)
                return
            if "@value" in value:
                yield self._value_object(value, ctx)
                return
            if set(value) <= {"@id"} and "@id" in value:
                s, kind = self._subject_of(value, ctx)
                yield (s, kind, None, None)
                return
            s, kind = self._node(value, ctx, graph)
            yield (s, kind, None, None)
            return
        yield self._scalar(value, ctx, tdef)

    def _list(self, items, ctx: _Context, graph: tuple, tdef: dict) -> tuple:
        if not isinstance(items, list):
            items = [items]
        objs = []
        for v in items:
            objs.extend(self._values(v, ctx, graph, {k: x for k, x in tdef.items()
                                                     if k != "@container"}))
        if not objs:
            return (RDF_NIL, KIND_IRI, None, None)
        head = self._mint()
        cur = head
        for i, o in enumerate(objs):
            self._emit(cur, RDF_FIRST, o, graph)
            if i + 1 < len(objs):
                nxt = self._mint()
                self._emit(cur, RDF_REST, (nxt[0], nxt[1], None, None), graph)
                cur = nxt
            else:
                self._emit(cur, RDF_REST, (RDF_NIL, KIND_IRI, None, None), graph)
        return (head[0], head[1], None, None)

    def _value_object(self, value: dict, ctx: _Context) -> tuple:
        bad = set(value) - {"@value", "@type", "@language", "@index"}
        if bad:
            raise _err("unsupported keyword in value object: %s" % bad.pop())
        v = value["@value"]
        lang = value.get("@language")
        dt = value.get("@type")
        if lang is not None and not isinstance(lang, str):
            raise _err("@language must be a string")
        if dt is not None and not isinstance(dt, str):
            raise _err("value-object @type must be a string")
        if lang is not None and dt is not None:
            raise _err("@language and @type are mutually exclusive")
        if dt is not None:
            iri = ctx.expand_iri(dt, vocab=True)
            if iri is None or iri.startswith("@"):
                # "@json" lands here: no JSON literals in the core subset
                raise _err("cannot expand datatype: %r" % dt)
            return (self._lex(v), KIND_LITERAL, iri, None)
        if lang is not None:
            if not isinstance(v, str):
                raise _err("@language requires a string @value")
            return (v, KIND_LITERAL, RDF_LANG_STRING, lang)
        return self._scalar(v, ctx, {})

    def _scalar(self, v, ctx: _Context, tdef: dict) -> tuple:
        if isinstance(v, str):
            coerce = tdef.get("@type")
            if coerce == "@id":
                iri = ctx.expand_iri(v)
                if iri is None:
                    raise _err("cannot expand @id-coerced value: %r" % v)
                kind = KIND_BLANK if iri.startswith("_:") else KIND_IRI
                return (iri, kind, None, None)
            if coerce is not None:
                iri = ctx.expand_iri(coerce, vocab=True)
                if iri is None or iri.startswith("@"):
                    raise _err("cannot expand coercion datatype: %r" % coerce)
                return (v, KIND_LITERAL, iri, None)
            lang = tdef.get("@language", ctx.language)
            if lang is not None and not isinstance(lang, str):
                raise _err("@language must be a string")
            if lang:
                return (v, KIND_LITERAL, RDF_LANG_STRING, lang)
            return (v, KIND_LITERAL, XSD_STRING, None)
        if isinstance(v, bool):
            return ("true" if v else "false", KIND_LITERAL, XSD_BOOLEAN, None)
        if isinstance(v, int):
            return (str(v), KIND_LITERAL, XSD_INTEGER, None)
        if isinstance(v, float):
            return (repr(v), KIND_LITERAL, XSD_DOUBLE, None)
        if v is None:
            raise _err("null is not a valid RDF value")
        raise _err("unsupported JSON value type: %r" % type(v).__name__)

    def _lex(self, v) -> str:
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        raise _err("unsupported @value type: %r" % type(v).__name__)

    def _emit(self, subj: tuple, pred: str, obj: tuple, graph: tuple) -> None:
        self.out.append(
            (subj[0], subj[1], pred, obj[0], obj[1], obj[2], obj[3],
             graph[0], graph[1])
        )


def parse_jsonld(text: str, base: str = "") -> list[tuple]:
    """Strict whole-document JSON-LD parse → list of 9-tuples (quads)."""
    return JsonLdParser(text, base=base).parse_all()


def encode_jsonld(rows, indent: int | None = None) -> str:
    """Encode quads (9-tuples or 7-tuple triples) as expanded-form JSON-LD.

    Output shape: a top-level array of node objects grouped by subject;
    named graphs become ``{"@id": g, "@graph": [...]}`` wrappers.  Blank
    nodes keep their ``_:`` labels (valid expanded JSON-LD).
    """
    by_graph: dict[tuple, dict] = {}
    for r in rows:
        r = tuple(r)
        if len(r) == 7:
            g = (DEFAULT_GRAPH, KIND_BLANK)
        else:
            g = (r[7], r[8])
        s, s_kind, p, o, o_kind, o_dt, o_lang = r[:7]
        nodes = by_graph.setdefault(g, {})
        node = nodes.setdefault(s, {"@id": s})
        if p == RDF_TYPE and o_kind == KIND_IRI:
            node.setdefault("@type", []).append(o)
            continue
        if o_kind == KIND_LITERAL:
            if o_lang:
                val = {"@value": o, "@language": o_lang}
            elif o_dt and o_dt != XSD_STRING:
                val = {"@value": o, "@type": o_dt}
            else:
                val = {"@value": o}
        else:
            val = {"@id": o}
        node.setdefault(p, []).append(val)

    def graph_nodes(nodes: dict) -> list:
        return [nodes[s] for s in sorted(nodes)]

    out = []
    default = by_graph.pop((DEFAULT_GRAPH, KIND_BLANK), None)
    if default:
        out.extend(graph_nodes(default))
    for (g, _kind) in sorted(by_graph, key=lambda t: t[0]):
        out.append({"@id": g, "@graph": graph_nodes(by_graph[(g, _kind)])})
    return json.dumps(out, ensure_ascii=False, indent=indent, sort_keys=True)
