"""SHACL shapes-graph front end: Turtle shapes → validation report.

Graft addition — no reference analogue (knakk/rdf stops at
parse/serialize; the term model validated here is the one its
rdf.go:56,136-140 kinds define).  Real SHACL users author shapes as a
Turtle *shapes graph*, not Python dicts.  This module parses a shapes
graph with the repo's own Turtle parser (dogfooding the conformance
surface), compiles the W3C SHACL core constraint components into the
set-at-a-time validation specs of :mod:`rdf_spark.ops.shacl` — the one
Catalyst-compiled validator, used by both front ends — and returns its
violations report.

Supported (SHACL core):

- targets: ``sh:targetClass`` (multiple allowed), ``sh:targetNode``,
  ``sh:targetSubjectsOf``, ``sh:targetObjectsOf``
- paths: predicate IRIs, ``[ sh:inversePath <p> ]``, sequence paths
  ``( <p1> <p2> … )`` and ``[ sh:alternativePath ( … ) ]``,
  arbitrarily nested (closure paths — zeroOrMorePath family — are
  not supported)
- property shapes: ``sh:minCount``/``sh:maxCount``,
  ``sh:datatype``, ``sh:class``, ``sh:nodeKind`` (all six values),
  ``sh:pattern``+``sh:flags``, ``sh:minLength``/``sh:maxLength``,
  ``sh:minInclusive``/``sh:maxInclusive``/``sh:minExclusive``/
  ``sh:maxExclusive``, ``sh:in``, ``sh:hasValue``, ``sh:uniqueLang``,
  ``sh:languageIn``; ``sh:or`` of value-testing alternatives (compiled
  to ONE row-local boolean predicate — alternation costs no extra
  scans) and ``sh:and`` (constraint merge); ``sh:node`` (value-node
  conformance to a referenced/inline shape, arbitrary nesting,
  compile-time cycle rejection); ``sh:qualifiedValueShape`` +
  ``sh:qualifiedMin/MaxCount``; pair constraints ``sh:equals`` /
  ``sh:disjoint`` / ``sh:lessThan`` / ``sh:lessThanOrEquals``
- node shapes: ``sh:closed`` + ``sh:ignoredProperties``; focus-level
  ``sh:not`` / ``sh:or`` / ``sh:xone`` over operand shapes (violator-set
  algebra: per-operand violator sets joined on focus — bytes per row)
  and ``sh:and`` (operand property shapes inlined)

SPARQL-based constraints (``sh:sparql`` with ``sh:select`` +
``sh:message``) are supported on TARGETED NODE SHAPES, compiled onto
:mod:`rdf_spark.sparql` — ``$this`` rewrites to ``?this`` and the
SELECT runs once set-at-a-time, inner-joined against the target set
(``?value``/``?path`` projections map to the report columns).

Deliberate core-subset boundaries (raise :class:`ShaclError`, never
silently half-validate): nested focus-level combinators, closure
paths, ``sh:qualifiedValueShapesDisjoint``, ``sh:prefixes`` (declare
PREFIX inline in the select string), and ``sh:sparql`` anywhere other
than a targeted node shape.  ``sh:class`` tests direct ``rdf:type``
assertions only — run :func:`rdf_spark.ops.reasoning.rdfs_closure`
first for subclass entailment; that composition is the idiomatic
pipeline here.

Scale shape: the shapes graph is parsed and compiled on the driver —
shapes are human-authored and tiny (every production validator does
this); the validation itself is ops.shacl's predicate-pruned scans +
joins, nothing collected.
"""
from __future__ import annotations

from rdf_spark.ops.shacl import (
    conforms,
    path_str,
    validate,
    violation_stats,
)
from rdf_spark.terms import KIND_BLANK, KIND_IRI

__all__ = [
    "SH", "ShaclError", "parse_shapes", "shacl_validate", "shacl_conforms",
    "shacl_stats",
]

SH = "http://www.w3.org/ns/shacl#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


class ShaclError(ValueError):
    """Unsupported or malformed shapes graph."""


_UNSUPPORTED = ("qualifiedValueShapesDisjoint",)

_NODE_KIND_NAMES = {
    SH + "IRI": "IRI",
    SH + "Literal": "Literal",
    SH + "BlankNode": "BlankNode",
    SH + "BlankNodeOrIRI": "BlankNodeOrIRI",
    SH + "BlankNodeOrLiteral": "BlankNodeOrLiteral",
    SH + "IRIOrLiteral": "IRIOrLiteral",
}


def _index(rows):
    """s → p → [(o, o_kind, o_datatype, o_lang)] over parsed tuples."""
    idx: dict[str, dict[str, list[tuple]]] = {}
    for s, _sk, p, o, ok, dt, lang in rows:
        idx.setdefault(s, {}).setdefault(p, []).append((o, ok, dt, lang))
    return idx


def _rdf_list_nodes(idx, head):
    """Walk an rdf:first/rdf:rest list; returns (member, kind) pairs."""
    out, seen = [], set()
    node, kind = head
    while not (kind == KIND_IRI and node == RDF_NIL):
        if node in seen:
            raise ShaclError("cyclic RDF list in shapes graph")
        seen.add(node)
        props = idx.get(node, {})
        first, rest = props.get(RDF_FIRST), props.get(RDF_REST)
        if not first or not rest:
            raise ShaclError("malformed RDF list in shapes graph")
        out.append((first[0][0], first[0][1]))
        node, kind = rest[0][0], rest[0][1]
    return out


def _rdf_list(idx, head):
    """Walk an rdf:first/rdf:rest list; returns the lexical forms."""
    return [lex for lex, _k in _rdf_list_nodes(idx, head)]


def _one(props, pred):
    vals = props.get(SH + pred)
    if not vals:
        return None
    if len(vals) > 1:
        raise ShaclError(f"multiple sh:{pred} values on one shape")
    return vals[0]


def _one_lex(props, pred):
    v = _one(props, pred)
    return None if v is None else v[0]


def _one_int(props, pred):
    v = _one_lex(props, pred)
    return None if v is None else int(v)


def _reject_unsupported(props, where):
    for bad in _UNSUPPORTED:
        if SH + bad in props:
            raise ShaclError(
                f"sh:{bad} on {where} is not supported (core subset)")


def _value_constraints(idx, pprops) -> dict:
    """The value-testing constraint keys shared by property shapes and
    sh:or alternatives."""
    spec: dict = {}
    for key, getter in (("min_length", "minLength"),
                        ("max_length", "maxLength")):
        v = _one_int(pprops, getter)
        if v is not None:
            spec[key] = v
    for key, getter in (
            ("datatype", "datatype"),
            ("pattern", "pattern"), ("flags", "flags"),
            ("min_inclusive", "minInclusive"),
            ("max_inclusive", "maxInclusive"),
            ("min_exclusive", "minExclusive"),
            ("max_exclusive", "maxExclusive")):
        v = _one_lex(pprops, getter)
        if v is not None:
            spec[key] = v
    nk = _one(pprops, "nodeKind")
    if nk is not None:
        name = _NODE_KIND_NAMES.get(nk[0])
        if name is None:
            raise ShaclError(f"unknown sh:nodeKind {nk[0]}")
        spec["node_kind"] = name
    inv = _one(pprops, "in")
    if inv is not None:
        spec["in"] = _rdf_list(idx, (inv[0], inv[1]))
    li = _one(pprops, "languageIn")
    if li is not None:
        spec["language_in"] = _rdf_list(idx, (li[0], li[1]))
    return spec


def _compile_value_alt(idx, node) -> dict:
    """One sh:or alternative on a property shape: value-testing
    constraints only (no path, no cardinality)."""
    pprops = idx.get(node)
    if pprops is None:
        raise ShaclError("sh:or alternative has no triples")
    _reject_unsupported(pprops, "sh:or alternative")
    spec = _value_constraints(idx, pprops)
    extras = set(pprops) - {SH + k for k in (
        "datatype", "nodeKind", "pattern", "flags", "minLength",
        "maxLength", "minInclusive", "maxInclusive", "minExclusive",
        "maxExclusive", "in", "languageIn")}
    if extras or not spec:
        raise ShaclError(
            "sh:or on a property shape takes alternatives of "
            "value-testing constraints only")
    return spec


def _compile_operand_shape(idx, node, visiting=frozenset(),
                           allow_targets=False,
                           value_form=False) -> dict:
    """An operand shape for combinators / sh:node /
    sh:qualifiedValueShape.  Focus-level combinator operands
    (``value_form=False``) take sh:property constraints only.
    Value-form operands additionally accept constraints on the value
    node itself: value-testing keys (→ ``value_alt``) and ``sh:class``
    (→ ``value_class``).  Nested combinators are rejected; targets are
    rejected on combinator operands and IGNORED on referenced named
    shapes (legal per §2.1.3)."""
    if node in visiting:
        raise ShaclError(f"cyclic shape reference through {node}")
    props = idx.get(node)
    if props is None:
        raise ShaclError("shape operand has no triples")
    _reject_unsupported(props, "shape operand")
    if SH + "sparql" in props:
        raise ShaclError(
            "sh:sparql nested inside a shape operand is not supported "
            "— attach it to the targeted node shape")
    for bad in ("or", "and", "not", "xone", "closed"):
        if SH + bad in props:
            raise ShaclError(
                f"sh:{bad} nested inside a shape operand is not "
                "supported")
    if not allow_targets:
        for t in ("targetClass", "targetNode", "targetSubjectsOf",
                  "targetObjectsOf"):
            if SH + t in props:
                raise ShaclError("combinator operands must not declare "
                                 "targets")
    spec: dict = {"id": node}
    if value_form:
        alt = _value_constraints(idx, props)
        if alt:
            spec["value_alt"] = alt
        cls = _one_lex(props, "class")
        if cls is not None:
            spec["value_class"] = cls
    plist = [
        _compile_property(idx, o, visiting | {node})
        for (o, _ok, _dt, _lg) in props.get(SH + "property", ())
    ]
    if plist:
        plist.sort(key=lambda p: path_str(p["path"]))
        spec["properties"] = plist
    if len(spec) == 1:  # only "id"
        raise ShaclError("shape operand carries no constraints")
    return spec


def _compile_path(idx, lex, kind):
    """SHACL path expression → ops.shacl path spec: predicate IRI,
    ``("inv", iri)``, ``("seq", [...])``, ``("alt", [...])`` —
    arbitrarily nested; closures (zeroOrMorePath etc.) and inverse over
    non-predicates raise."""
    if kind == KIND_IRI:
        return lex
    if kind != KIND_BLANK:
        raise ShaclError("sh:path must be an IRI or a path expression")
    node = idx.get(lex)
    if node is None:
        raise ShaclError("sh:path expression node has no triples")
    if RDF_FIRST in node:  # an RDF list = sequence path
        return ("seq", [
            _compile_path(idx, m, k)
            for (m, k) in _rdf_list_nodes(idx, (lex, KIND_BLANK))
        ])
    inv = _one(node, "inversePath")
    if inv is not None:
        if inv[1] != KIND_IRI:
            raise ShaclError(
                "sh:inversePath is supported over predicates only")
        return ("inv", inv[0])
    alt = _one(node, "alternativePath")
    if alt is not None:
        return ("alt", [
            _compile_path(idx, m, k)
            for (m, k) in _rdf_list_nodes(idx, (alt[0], alt[1]))
        ])
    for closure in ("zeroOrMorePath", "oneOrMorePath", "zeroOrOnePath"):
        if SH + closure in node:
            raise ShaclError(f"sh:{closure} is not supported")
    raise ShaclError("unrecognized sh:path expression")


def _compile_property(idx, node, visiting=frozenset()) -> dict:
    pprops = idx.get(node)
    if pprops is None:
        raise ShaclError("sh:property target has no triples")
    _reject_unsupported(pprops, "property shape")
    if SH + "sparql" in pprops:
        raise ShaclError(
            "sh:sparql on a property shape is not supported — attach "
            "it to the targeted node shape (its SELECT sees $this)")
    for bad in ("not", "xone"):
        if SH + bad in pprops:
            raise ShaclError(
                f"sh:{bad} on a property shape is not supported "
                "(focus-level combinators go on the node shape)")
    path = _one(pprops, "path")
    if path is None:
        raise ShaclError("property shape without sh:path")
    spec: dict = {"path": _compile_path(idx, path[0], path[1])}
    for key, getter in (("min_count", "minCount"),
                        ("max_count", "maxCount")):
        v = _one_int(pprops, getter)
        if v is not None:
            spec[key] = v
    cls = _one_lex(pprops, "class")
    if cls is not None:
        spec["class"] = cls
    hv = _one_lex(pprops, "hasValue")
    if hv is not None:
        spec["has_value"] = hv
    for key, getter in (("equals", "equals"), ("disjoint", "disjoint"),
                        ("less_than", "lessThan"),
                        ("less_than_or_equals", "lessThanOrEquals")):
        v = _one(pprops, getter)
        if v is not None:
            if v[1] != KIND_IRI:
                raise ShaclError(f"sh:{getter} takes a predicate IRI")
            spec[key] = v[0]
    if _one_lex(pprops, "uniqueLang") == "true":
        spec["unique_lang"] = True
    spec.update(_value_constraints(idx, pprops))
    orv = _one(pprops, "or")
    if orv is not None:
        alts = _rdf_list_nodes(idx, (orv[0], orv[1]))
        if not alts:
            raise ShaclError("empty sh:or alternative list")
        spec["or"] = [_compile_value_alt(idx, n) for (n, _k) in alts]
    andv = _one(pprops, "and")
    if andv is not None:
        # value-level sh:and = plain conjunction — merge operand
        # constraints into this property shape
        for (n, _k) in _rdf_list_nodes(idx, (andv[0], andv[1])):
            alt = _compile_value_alt(idx, n)
            dup = set(alt) & set(spec)
            if dup:
                raise ShaclError(
                    f"sh:and operand repeats constraint {sorted(dup)}")
            spec.update(alt)
    nodev = _one(pprops, "node")
    if nodev is not None:
        spec["node"] = _compile_operand_shape(
            idx, nodev[0], visiting, allow_targets=True,
            value_form=True)
    qv = _one(pprops, "qualifiedValueShape")
    qmin = _one_int(pprops, "qualifiedMinCount")
    qmax = _one_int(pprops, "qualifiedMaxCount")
    if qv is not None:
        if qmin is None and qmax is None:
            raise ShaclError(
                "sh:qualifiedValueShape needs sh:qualifiedMinCount "
                "and/or sh:qualifiedMaxCount")
        spec["qualified_shape"] = _compile_operand_shape(
            idx, qv[0], visiting, allow_targets=True, value_form=True)
        if qmin is not None:
            spec["qualified_min"] = qmin
        if qmax is not None:
            spec["qualified_max"] = qmax
    elif qmin is not None or qmax is not None:
        raise ShaclError(
            "sh:qualifiedMin/MaxCount without sh:qualifiedValueShape")
    return spec


def parse_shapes(shapes_ttl: str) -> list[dict]:
    """Parse a Turtle shapes graph into ops.shacl validation specs.

    Driver-side by design (shapes graphs are tiny).  A subject is a
    node shape iff it is typed ``sh:NodeShape`` or carries a target
    declaration.  Returns specs sorted by shape IRI so the compiled
    plan — and therefore the report — is deterministic.
    """
    from rdf_spark.parsing import parse_turtle

    idx = _index(parse_turtle(shapes_ttl))
    shapes = []
    any_node_shape = False
    for s, props in idx.items():
        types = [o for (o, ok, _dt, _lg) in props.get(RDF_TYPE, ())
                 if ok == KIND_IRI]
        targeted = any(SH + t in props for t in (
            "targetClass", "targetNode", "targetSubjectsOf",
            "targetObjectsOf"))
        if (SH + "NodeShape") not in types and not targeted:
            continue
        any_node_shape = True
        if not targeted:
            # a named shape with no target validates nothing on its own
            # (SHACL §2.1.3) — it only runs where referenced (sh:node),
            # compiled at the reference site
            continue
        _reject_unsupported(props, f"shape {s}")
        spec: dict = {"id": s}
        for key, pred in (
                ("target_class", "targetClass"),
                ("target_node", "targetNode"),
                ("target_subjects_of", "targetSubjectsOf"),
                ("target_objects_of", "targetObjectsOf")):
            vals = [o for (o, _ok, _dt, _lg) in props.get(SH + pred, ())]
            if vals:
                spec[key] = sorted(vals)
        if _one_lex(props, "closed") == "true":
            spec["closed"] = True
        ign = _one(props, "ignoredProperties")
        if ign is not None:
            spec["ignored_properties"] = _rdf_list(idx, (ign[0], ign[1]))
        spec["properties"] = [
            _compile_property(idx, o)
            for (o, _ok, _dt, _lg) in props.get(SH + "property", ())
        ]
        # focus-level combinators: operands are anonymous node shapes
        # carrying sh:property constraints
        notv = _one(props, "not")
        if notv is not None:
            spec["not_shape"] = _compile_operand_shape(idx, notv[0])
        orv = _one(props, "or")
        if orv is not None:
            ops_ = _rdf_list_nodes(idx, (orv[0], orv[1]))
            if not ops_:
                raise ShaclError("empty sh:or operand list")
            spec["or_shapes"] = [
                _compile_operand_shape(idx, n) for (n, _k) in ops_]
        xv = _one(props, "xone")
        if xv is not None:
            ops_ = _rdf_list_nodes(idx, (xv[0], xv[1]))
            if not ops_:
                raise ShaclError("empty sh:xone operand list")
            spec["xone_shapes"] = [
                _compile_operand_shape(idx, n) for (n, _k) in ops_]
        andv = _one(props, "and")
        if andv is not None:
            # focus-level sh:and = conjunction — inline the operands'
            # property shapes
            for (n, _k) in _rdf_list_nodes(idx, (andv[0], andv[1])):
                spec["properties"].extend(
                    _compile_operand_shape(idx, n)["properties"])
        sqs = []
        for (n, _nk, _dt, _lg) in props.get(SH + "sparql", ()):
            nprops = idx.get(n, {})
            if SH + "prefixes" in nprops:
                raise ShaclError(
                    "sh:prefixes is not supported — declare PREFIX "
                    "inline in the sh:select string")
            sel = _one_lex(nprops, "select")
            if sel is None:
                raise ShaclError(f"sh:sparql on {s} needs sh:select")
            sqs.append({
                "select": sel,
                "message": _one_lex(nprops, "message"),
            })
        if sqs:
            spec["sparql"] = sorted(
                sqs, key=lambda d: d["select"])
        spec["properties"].sort(key=lambda p: path_str(p["path"]))
        shapes.append(spec)
    shapes.sort(key=lambda sp: sp["id"])
    if not shapes:
        raise ShaclError(
            "shapes graph declares no targeted node shapes"
            if any_node_shape else "shapes graph declares no node shapes")
    return shapes


def shacl_validate(triples, shapes_ttl: str):
    """Validate a triple DataFrame against a Turtle shapes graph.

    Returns the ops.shacl report
    ``(focus, shape_id, path, constraint, value, expected)`` — one row
    per violation, empty ⇔ conformant.
    """
    return validate(triples, parse_shapes(shapes_ttl))


def shacl_conforms(triples, shapes_ttl: str) -> bool:
    return conforms(triples, parse_shapes(shapes_ttl))


def shacl_stats(triples, shapes_ttl: str):
    return violation_stats(triples, parse_shapes(shapes_ttl))
