"""SHACL Turtle shapes-graph front end (rdf_spark/shacl.py).

Hand-built graphs with one planted violation per constraint component;
expectations worked by hand against the W3C SHACL core semantics.  The
validator itself is rdf_spark.ops.shacl (shared with the dict front
end); these tests exercise the Turtle compilation path plus the
constraint families added alongside it (targets, numeric ranges,
hasValue, closed shapes, nodeKind combos, pattern flags).
"""
import pytest

from rdf_spark.shacl import (
    RDF_TYPE,
    SH,
    ShaclError,
    parse_shapes,
    shacl_conforms,
    shacl_validate,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "urn:ex:"

TRIPLE_DDL = (
    "s string, s_kind int, p string, o string, o_kind int, "
    "o_datatype string, o_lang string"
)


def _df(spark, rows):
    return spark.createDataFrame(
        [r + (None,) * (7 - len(r)) for r in rows], TRIPLE_DDL)


def _viol(df):
    return sorted(
        (r.focus, r.path, r.constraint, r.value) for r in df.collect())


BASE = [
    (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
    (EX + "p2", 1, RDF_TYPE, EX + "Person", 1, None),
    (EX + "p3", 1, RDF_TYPE, EX + "Person", 1, None),
    # names: p1 ok, p2 has two, p3 none
    (EX + "p1", 1, EX + "name", "Alice", 2, XSD + "string"),
    (EX + "p2", 1, EX + "name", "Bob", 2, XSD + "string"),
    (EX + "p2", 1, EX + "name", "Bobby", 2, XSD + "string"),
    # ages: p1 ok int, p2 negative, p3 string-typed junk
    (EX + "p1", 1, EX + "age", "30", 2, XSD + "integer"),
    (EX + "p2", 1, EX + "age", "-4", 2, XSD + "integer"),
    (EX + "p3", 1, EX + "age", "young", 2, XSD + "string"),
    # knows: p1→p2 (IRI), p3→literal
    (EX + "p1", 1, EX + "knows", EX + "p2", 1, None),
    (EX + "p3", 1, EX + "knows", "somebody", 2, XSD + "string"),
]


SHAPES = f"""
@prefix sh: <{SH}> .
@prefix xsd: <{XSD}> .
@prefix ex: <{EX}> .
ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:pattern "^[A-Z]" ] ;
  sh:property [ sh:path ex:age ; sh:datatype xsd:integer ;
                sh:minInclusive 0 ] ;
  sh:property [ sh:path ex:knows ; sh:nodeKind sh:IRI ;
                sh:class ex:Person ] .
"""


def test_core_constraints(spark):
    got = _viol(shacl_validate(_df(spark, BASE), SHAPES))
    name, age, knows = EX + "name", EX + "age", EX + "knows"
    assert (EX + "p3", name, "minCount", "0") in got
    assert (EX + "p2", name, "maxCount", "2") in got
    # all planted names start uppercase → no pattern violations
    assert not [g for g in got if g[2] == "pattern"]
    # datatype: p3's xsd:string age
    assert (EX + "p3", age, "datatype", "young") in got
    # minInclusive: p2 negative AND p3 incomparable
    assert (EX + "p2", age, "minInclusive", "-4") in got
    assert (EX + "p3", age, "minInclusive", "young") in got
    # nodeKind + class both fire on p3's literal object
    assert (EX + "p3", knows, "nodeKind", "somebody") in got
    assert (EX + "p3", knows, "class", "somebody") in got
    # class ok for p1→p2 (p2 is typed Person); p1's name is clean
    assert (EX + "p1", knows, "class", EX + "p2") not in got
    assert not [g for g in got if g[0] == EX + "p1" and g[1] == name]


def test_conformant_graph(spark):
    rows = [
        (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p1", 1, EX + "name", "Alice", 2, XSD + "string"),
        (EX + "p1", 1, EX + "age", "30", 2, XSD + "integer"),
    ]
    assert shacl_conforms(_df(spark, rows), SHAPES)


def test_in_hasvalue_lengths_exclusive(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:seg ;
      sh:property [ sh:path ex:seg ; sh:in ("A" "B") ;
                    sh:minLength 1 ; sh:maxLength 1 ] ;
      sh:property [ sh:path ex:tag ; sh:hasValue "gold" ] ;
      sh:property [ sh:path ex:score ; sh:maxExclusive 10 ] .
    """
    rows = [
        (EX + "s1", 1, EX + "seg", "A", 2, XSD + "string"),
        (EX + "s2", 1, EX + "seg", "CC", 2, XSD + "string"),
        (EX + "s1", 1, EX + "tag", "gold", 2, XSD + "string"),
        (EX + "s1", 1, EX + "score", "10", 2, XSD + "integer"),
        (EX + "s2", 1, EX + "score", "9.5", 2, XSD + "decimal"),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert (EX + "s2", EX + "seg", "in", "CC") in got
    assert (EX + "s2", EX + "seg", "maxLength", "CC") in got
    assert (EX + "s2", EX + "tag", "hasValue", None) in got
    assert (EX + "s1", EX + "tag", "hasValue", None) not in got
    # maxExclusive: 10 >= 10 violates, 9.5 conforms
    assert (EX + "s1", EX + "score", "maxExclusive", "10") in got
    assert (EX + "s2", EX + "score", "maxExclusive", "9.5") not in got


def test_inverse_path_and_target_objects_of(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetObjectsOf ex:memberOf ;
      sh:property [ sh:path [ sh:inversePath ex:memberOf ] ;
                    sh:minCount 2 ] .
    """
    rows = [
        (EX + "a", 1, EX + "memberOf", EX + "g1", 1, None),
        (EX + "b", 1, EX + "memberOf", EX + "g1", 1, None),
        (EX + "c", 1, EX + "memberOf", EX + "g2", 1, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "g2", "^" + EX + "memberOf", "minCount", "1")]


def test_closed_shape(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Person ; sh:closed true ;
      sh:ignoredProperties ( ex:note ) ;
      sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    rows = [
        (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p1", 1, EX + "name", "Alice", 2, XSD + "string"),
        (EX + "p1", 1, EX + "note", "ok ignored", 2, XSD + "string"),
        (EX + "p1", 1, EX + "extra", "boom", 2, XSD + "string"),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "p1", EX + "extra", "closed", "boom")]


def test_target_node_and_nodekind_combo(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetNode ex:root ;
      sh:property [ sh:path ex:child ; sh:minCount 2 ;
                    sh:nodeKind sh:BlankNodeOrIRI ] .
    """
    rows = [
        (EX + "root", 1, EX + "child", EX + "c1", 1, None),
        (EX + "root", 1, EX + "child", "a literal", 2, XSD + "string"),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [
        (EX + "root", EX + "child", "nodeKind", "a literal")]


def test_pattern_flags_i(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:name ;
      sh:property [ sh:path ex:name ; sh:pattern "^alice$" ;
                    sh:flags "i" ] .
    """
    rows = [
        (EX + "s1", 1, EX + "name", "ALICE", 2, XSD + "string"),
        (EX + "s2", 1, EX + "name", "Bob", 2, XSD + "string"),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "s2", EX + "name", "pattern", "Bob")]


def test_parse_shapes_spec_shape():
    specs = parse_shapes(SHAPES)
    assert len(specs) == 1
    sp = specs[0]
    assert sp["id"] == EX + "PersonShape"
    assert sp["target_class"] == [EX + "Person"]
    paths = [p["path"] for p in sp["properties"]]
    assert paths == sorted(paths)
    age = [p for p in sp["properties"] if p["path"] == EX + "age"][0]
    assert age == {"path": EX + "age", "datatype": XSD + "integer",
                   "min_inclusive": "0"}


def test_unique_lang_and_language_in(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:label ;
      sh:property [ sh:path ex:label ; sh:uniqueLang true ;
                    sh:languageIn ("en" "fr") ] .
    """
    rows = [
        (EX + "s1", 1, EX + "label", "hi", 2, None, "en"),
        (EX + "s1", 1, EX + "label", "hello", 2, None, "en"),
        (EX + "s1", 1, EX + "label", "salut", 2, None, "fr"),
        (EX + "s2", 1, EX + "label", "hallo", 2, None, "de"),
        (EX + "s2", 1, EX + "label", "howdy", 2, None, "en-US"),
        (EX + "s2", 1, EX + "label", "plain", 2, XSD + "string", None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    # uniqueLang: s1 has two @en labels (one row per duplicated tag);
    # untagged values ignored
    assert (EX + "s1", EX + "label", "uniqueLang", "en") in got
    assert not [g for g in got if g[2] == "uniqueLang" and g[0] != EX + "s1"]
    # languageIn: de fails, en-US passes (primary-subtag match),
    # untagged fails
    assert (EX + "s2", EX + "label", "languageIn", "hallo") in got
    assert (EX + "s2", EX + "label", "languageIn", "plain") in got
    assert (EX + "s2", EX + "label", "languageIn", "howdy") not in got


def test_unsupported_components_raise():
    for frag in ("sh:or ()", "sh:not []",
                 "sh:sparql []",
                 "sh:property [ sh:path ex:x ; sh:qualifiedValueShape [ sh:class ex:C ] ; sh:qualifiedMinCount 1 ; sh:qualifiedValueShapesDisjoint true ]",
                 "sh:property [ sh:path [ sh:zeroOrMorePath ex:a ] ; sh:minCount 1 ]"):
        shapes = f"""
        @prefix sh: <{SH}> .
        @prefix ex: <{EX}> .
        ex:S a sh:NodeShape ; sh:targetClass ex:T ; {frag} .
        """
        with pytest.raises(ShaclError):
            parse_shapes(shapes)
    with pytest.raises(ShaclError):
        parse_shapes(f"@prefix ex: <{EX}> . ex:a ex:b ex:c .")


def test_shape_without_target_raises(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ;
      sh:property [ sh:path ex:x ; sh:minCount 1 ] .
    """
    with pytest.raises(ValueError):
        shacl_validate(_df(spark, BASE), shapes)


def test_value_level_or(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix xsd: <{XSD}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
      sh:property [ sh:path ex:v ;
                    sh:or ( [ sh:datatype xsd:integer ]
                            [ sh:nodeKind sh:IRI ] ) ] .
    """
    rows = [
        (EX + "a", 1, EX + "v", "3", 2, XSD + "integer"),
        (EX + "a", 1, EX + "v", EX + "ref", 1, None),
        (EX + "a", 1, EX + "v", "nope", 2, XSD + "string"),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "a", EX + "v", "or", "nope")]


def test_property_sh_and_merges(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
      sh:property [ sh:path ex:v ; sh:minLength 2 ;
                    sh:and ( [ sh:pattern "^[a-z]+$" ] ) ] .
    """
    rows = [
        (EX + "a", 1, EX + "v", "ok", 2, None),
        (EX + "a", 1, EX + "v", "X", 2, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert (EX + "a", EX + "v", "minLength", "X") in got
    assert (EX + "a", EX + "v", "pattern", "X") in got
    assert not [g for g in got if g[3] == "ok"]


def test_focus_level_not(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:not [ sh:property [ sh:path ex:deprecated ;
                             sh:minCount 1 ] ] .
    """
    rows = [
        (EX + "a", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "b", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "a", 1, EX + "deprecated", "yes", 2, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    # a HAS deprecated → conforms to the operand → violates sh:not
    assert got == [(EX + "a", None, "not", None)]


def test_focus_level_or_and_xone(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:or ( [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ]
              [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] ) .
    ex:X a sh:NodeShape ; sh:targetClass ex:T ;
      sh:xone ( [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ]
                [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] ) .
    """
    rows = [
        (EX + "both", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "both", 1, EX + "email", "e", 2, None),
        (EX + "both", 1, EX + "phone", "p", 2, None),
        (EX + "one", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "one", 1, EX + "email", "e", 2, None),
        (EX + "none", 1, RDF_TYPE, EX + "T", 1, None),
    ]
    rep = shacl_validate(_df(spark, rows), shapes)
    got = sorted((r.focus, r.shape_id, r.constraint) for r in rep.collect())
    # or: only 'none' violates; xone: 'both' (2 matches) and 'none' (0)
    assert got == [
        (EX + "both", EX + "X", "xone"),
        (EX + "none", EX + "S", "or"),
        (EX + "none", EX + "X", "xone"),
    ]


def test_focus_level_and_inlines(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:and ( [ sh:property [ sh:path ex:a ; sh:minCount 1 ] ]
               [ sh:property [ sh:path ex:b ; sh:minCount 1 ] ] ) .
    """
    rows = [(EX + "x", 1, RDF_TYPE, EX + "T", 1, None),
            (EX + "x", 1, EX + "a", "v", 2, None)]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "x", EX + "b", "minCount", "0")]


def test_combinator_rejections():
    bad = [
        # nested combinator in operand
        "sh:not [ sh:or ( [ sh:property [ sh:path ex:a ; "
        "sh:minCount 1 ] ] ) ]",
        # operand with a target
        "sh:not [ sh:targetClass ex:Z ; sh:property [ sh:path ex:a ; "
        "sh:minCount 1 ] ]",
        # property-level sh:or with a non-value constraint
        "sh:property [ sh:path ex:v ; sh:or ( [ sh:minCount 1 ] ) ]",
        # property-level sh:not
        "sh:property [ sh:path ex:v ; sh:not [ sh:datatype ex:d ] ]",
    ]
    for frag in bad:
        shapes = f"""
        @prefix sh: <{SH}> .
        @prefix ex: <{EX}> .
        ex:S a sh:NodeShape ; sh:targetClass ex:T ; {frag} .
        """
        with pytest.raises(ShaclError):
            parse_shapes(shapes)


def test_sh_node_value_conformance(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:AddrShape a sh:NodeShape ;
      sh:property [ sh:path ex:zip ; sh:minCount 1 ] .
    ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
      sh:property [ sh:path ex:addr ; sh:node ex:AddrShape ] .
    """
    rows = [
        (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p1", 1, EX + "addr", EX + "a1", 1, None),
        (EX + "a1", 1, EX + "zip", "12345", 2, None),
        (EX + "p2", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p2", 1, EX + "addr", EX + "a2", 1, None),  # no zip
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "p2", EX + "addr", "node", EX + "a2")]
    # AddrShape itself declares no target → it does not fire standalone


def test_sh_node_two_levels(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:CityShape a sh:NodeShape ;
      sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    ex:AddrShape a sh:NodeShape ;
      sh:property [ sh:path ex:city ; sh:node ex:CityShape ] .
    ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
      sh:property [ sh:path ex:addr ; sh:node ex:AddrShape ] .
    """
    rows = [
        (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p1", 1, EX + "addr", EX + "a1", 1, None),
        (EX + "a1", 1, EX + "city", EX + "c1", 1, None),  # city w/o name
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    # a1's city violates CityShape → a1 violates AddrShape → p1 flagged
    assert got == [(EX + "p1", EX + "addr", "node", EX + "a1")]


def test_sh_node_cycle_rejected():
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:A a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path ex:p ; sh:node ex:B ] .
    ex:B a sh:NodeShape ;
      sh:property [ sh:path ex:q ; sh:node ex:A ] .
    """
    with pytest.raises(ShaclError):
        parse_shapes(shapes)


def test_qualified_value_shape_counts(spark):
    # each team needs 1-2 members that are managers (typed ex:Mgr)
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Team ;
      sh:property [ sh:path ex:member ;
                    sh:qualifiedValueShape [ sh:class ex:Mgr ] ;
                    sh:qualifiedMinCount 1 ;
                    sh:qualifiedMaxCount 2 ] .
    """
    rows = [
        (EX + "t1", 1, RDF_TYPE, EX + "Team", 1, None),
        (EX + "t1", 1, EX + "member", EX + "m1", 1, None),
        (EX + "t1", 1, EX + "member", EX + "w1", 1, None),
        (EX + "t2", 1, RDF_TYPE, EX + "Team", 1, None),
        (EX + "t2", 1, EX + "member", EX + "w2", 1, None),
        (EX + "t3", 1, RDF_TYPE, EX + "Team", 1, None),
        (EX + "t3", 1, EX + "member", EX + "m1", 1, None),
        (EX + "t3", 1, EX + "member", EX + "m2", 1, None),
        (EX + "t3", 1, EX + "member", EX + "m3", 1, None),
        (EX + "m1", 1, RDF_TYPE, EX + "Mgr", 1, None),
        (EX + "m2", 1, RDF_TYPE, EX + "Mgr", 1, None),
        (EX + "m3", 1, RDF_TYPE, EX + "Mgr", 1, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    # t1: 1 manager ok; t2: 0 → qualifiedMinCount; t3: 3 → qualifiedMax
    assert got == [
        (EX + "t2", EX + "member", "qualifiedMinCount", "0"),
        (EX + "t3", EX + "member", "qualifiedMaxCount", "3"),
    ]


def test_qualified_with_value_tests_and_properties(spark):
    # ≥1 value that is an integer literal AND whose node has ex:ok
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix xsd: <{XSD}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
      sh:property [ sh:path ex:v ;
                    sh:qualifiedValueShape [ sh:nodeKind sh:IRI ;
                        sh:property [ sh:path ex:ok ;
                                      sh:minCount 1 ] ] ;
                    sh:qualifiedMinCount 1 ] .
    """
    rows = [
        (EX + "a", 1, EX + "v", EX + "good", 1, None),
        (EX + "good", 1, EX + "ok", "y", 2, None),
        (EX + "b", 1, EX + "v", EX + "bad", 1, None),   # no ex:ok
        (EX + "c", 1, EX + "v", "literal", 2, None),    # wrong kind
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [
        (EX + "b", EX + "v", "qualifiedMinCount", "0"),
        (EX + "c", EX + "v", "qualifiedMinCount", "0"),
    ]
    # note: ex:good is a target too (subject of nothing) — only
    # subjects of ex:v are targets, so it is not flagged


def test_sh_node_value_form_class(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:ref ;
      sh:property [ sh:path ex:ref ; sh:node [ sh:class ex:T ] ] .
    """
    rows = [
        (EX + "a", 1, EX + "ref", EX + "x", 1, None),
        (EX + "x", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "a", 1, EX + "ref", EX + "y", 1, None),  # untyped
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [(EX + "a", EX + "ref", "node", EX + "y")]


def test_qualified_count_without_shape_raises():
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path ex:v ; sh:qualifiedMinCount 1 ] .
    """
    with pytest.raises(ShaclError):
        parse_shapes(shapes)


def test_pair_constraints_equals_disjoint(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:a ;
      sh:property [ sh:path ex:a ; sh:equals ex:b ;
                    sh:disjoint ex:c ] .
    """
    rows = [
        # s1: a={x,y} b={x} → y missing in b; c={x} → disjoint hit on x
        (EX + "s1", 1, EX + "a", "x", 2, None),
        (EX + "s1", 1, EX + "a", "y", 2, None),
        (EX + "s1", 1, EX + "b", "x", 2, None),
        (EX + "s1", 1, EX + "c", "x", 2, None),
        # s2: a={v} b={v,w} → w missing in a; c={} fine
        (EX + "s2", 1, EX + "a", "v", 2, None),
        (EX + "s2", 1, EX + "b", "v", 2, None),
        (EX + "s2", 1, EX + "b", "w", 2, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert (EX + "s1", EX + "a", "equals", "y") in got
    assert (EX + "s2", EX + "a", "equals", "w") in got
    assert (EX + "s1", EX + "a", "disjoint", "x") in got
    assert len([g for g in got if g[2] == "equals"]) == 2
    assert len([g for g in got if g[2] == "disjoint"]) == 1


def test_pair_constraints_less_than(spark):
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix xsd: <{XSD}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:start ;
      sh:property [ sh:path ex:start ; sh:lessThan ex:end ] .
    """
    I = XSD + "integer"
    rows = [
        (EX + "ok", 1, EX + "start", "1", 2, I),
        (EX + "ok", 1, EX + "end", "2", 2, I),
        # numeric compare, not lexicographic: 9 < 10
        (EX + "num", 1, EX + "start", "9", 2, I),
        (EX + "num", 1, EX + "end", "10", 2, I),
        (EX + "bad", 1, EX + "start", "5", 2, I),
        (EX + "bad", 1, EX + "end", "5", 2, I),
        # incomparable: IRI on the other side
        (EX + "inc", 1, EX + "start", "1", 2, I),
        (EX + "inc", 1, EX + "end", EX + "x", 1, None),
        # string fallback: both plain literals
        (EX + "str", 1, EX + "start", "apple", 2, None),
        (EX + "str", 1, EX + "end", "banana", 2, None),
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    assert got == [
        (EX + "bad", EX + "start", "lessThan", "5"),
        (EX + "inc", EX + "start", "lessThan", "1"),
    ]


def test_sequence_path(spark):
    # every person's address must resolve to a city with a zip ≥ 1000
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix xsd: <{XSD}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
      sh:property [ sh:path ( ex:addr ex:zip ) ;
                    sh:minCount 1 ; sh:minInclusive 1000 ] .
    """
    I = XSD + "integer"
    rows = [
        (EX + "p1", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p1", 1, EX + "addr", EX + "a1", 1, None),
        (EX + "a1", 1, EX + "zip", "2000", 2, I),
        (EX + "p2", 1, RDF_TYPE, EX + "Person", 1, None),
        (EX + "p2", 1, EX + "addr", EX + "a2", 1, None),
        (EX + "a2", 1, EX + "zip", "7", 2, I),
        (EX + "p3", 1, RDF_TYPE, EX + "Person", 1, None),  # no addr
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    seq = EX + "addr/" + EX + "zip"
    assert got == [
        (EX + "p2", seq, "minInclusive", "7"),
        (EX + "p3", seq, "minCount", "0"),
    ]


def test_alternative_path_and_nesting(spark):
    # phone OR (contact/phone), at least one required
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path [ sh:alternativePath
                        ( ex:phone ( ex:contact ex:phone ) ) ] ;
                    sh:minCount 1 ] .
    """
    rows = [
        (EX + "d", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "d", 1, EX + "phone", "123", 2, None),
        (EX + "i", 1, RDF_TYPE, EX + "T", 1, None),
        (EX + "i", 1, EX + "contact", EX + "c1", 1, None),
        (EX + "c1", 1, EX + "phone", "456", 2, None),
        (EX + "n", 1, RDF_TYPE, EX + "T", 1, None),  # neither
    ]
    got = _viol(shacl_validate(_df(spark, rows), shapes))
    alt = "(" + EX + "phone|" + EX + "contact/" + EX + "phone)"
    assert got == [(EX + "n", alt, "minCount", "0")]


def test_sequence_path_dedupes_routes(spark):
    # two routes to the same value node = ONE value (set semantics)
    shapes = f"""
    @prefix sh: <{SH}> .
    @prefix ex: <{EX}> .
    ex:S a sh:NodeShape ; sh:targetNode ex:r ;
      sh:property [ sh:path ( ex:a ex:b ) ; sh:maxCount 1 ] .
    """
    rows = [
        (EX + "r", 1, EX + "a", EX + "m1", 1, None),
        (EX + "r", 1, EX + "a", EX + "m2", 1, None),
        (EX + "m1", 1, EX + "b", EX + "v", 1, None),
        (EX + "m2", 1, EX + "b", EX + "v", 1, None),
    ]
    assert shacl_validate(_df(spark, rows), shapes).count() == 0


class TestShaclSparql:
    """sh:sparql constraint components (round-5: compiled onto the
    rdf_spark.sparql engine, set-at-a-time with $this -> ?this)."""

    SHAPES = """
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
          sh:sparql [ sh:message "bal over limit" ;
            sh:select '''SELECT $this ?value WHERE {
                $this <u:bal> ?value . $this <u:lim> ?lim .
                FILTER(?value > ?lim) }''' ] .
    """

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "s string, s_kind tinyint, p string, o string, "
            "o_kind tinyint, o_datatype string, o_lang string")

    def test_violations_joined_to_targets(self, spark):
        from rdf_spark.shacl import shacl_validate
        from rdf_spark.terms import RDF_TYPE

        rows = [
            ("u:a", 1, RDF_TYPE, "u:T", 1, None, None),
            ("u:a", 1, "u:bal", "900", 2, None, None),
            ("u:a", 1, "u:lim", "500", 2, None, None),
            ("u:b", 1, RDF_TYPE, "u:T", 1, None, None),
            ("u:b", 1, "u:bal", "100", 2, None, None),
            ("u:b", 1, "u:lim", "500", 2, None, None),
            # violating but UNTARGETED: absent from the report
            ("u:x", 1, "u:bal", "999", 2, None, None),
            ("u:x", 1, "u:lim", "1", 2, None, None),
        ]
        rep = shacl_validate(self._df(spark, rows), self.SHAPES).collect()
        assert [(r.focus, r.constraint, r.value, r.expected)
                for r in rep] == [
            ("u:a", "sparql", "900", "bal over limit")]

    def test_prefixes_rejected(self):
        from rdf_spark.shacl import ShaclError, parse_shapes

        import pytest as _pytest
        with _pytest.raises(ShaclError, match="sh:prefixes"):
            parse_shapes("""
                @prefix sh: <http://www.w3.org/ns/shacl#> .
                <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
                  sh:sparql [ sh:prefixes <u:p> ;
                    sh:select "SELECT ?this WHERE { ?this ?p ?o }" ] .
            """)

    def test_select_required(self):
        from rdf_spark.shacl import ShaclError, parse_shapes

        import pytest as _pytest
        with _pytest.raises(ShaclError, match="sh:select"):
            parse_shapes("""
                @prefix sh: <http://www.w3.org/ns/shacl#> .
                <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
                  sh:sparql [ sh:message "m" ] .
            """)

    def test_this_projection_required(self, spark):
        from rdf_spark.shacl import shacl_validate
        from rdf_spark.terms import RDF_TYPE

        import pytest as _pytest
        rows = [("u:a", 1, RDF_TYPE, "u:T", 1, None, None)]
        shapes = """
            @prefix sh: <http://www.w3.org/ns/shacl#> .
            <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
              sh:sparql [ sh:select "SELECT ?x WHERE { ?x ?p ?o }" ] .
        """
        with _pytest.raises(ValueError, match="project"):
            shacl_validate(self._df(spark, rows), shapes)


class TestShaclSparqlRegressions:
    def test_property_shape_sparql_rejected(self):
        from rdf_spark.shacl import ShaclError, parse_shapes

        import pytest as _pytest
        with _pytest.raises(ShaclError, match="property shape"):
            parse_shapes("""
                @prefix sh: <http://www.w3.org/ns/shacl#> .
                <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
                  sh:property [ sh:path <u:p> ;
                    sh:sparql [ sh:select "SELECT ?this WHERE {?this ?p ?o}" ] ] .
            """)

    def test_query_projecting_focus_var_not_ambiguous(self, spark):
        from rdf_spark.shacl import shacl_validate
        from rdf_spark.terms import RDF_TYPE

        rows = [
            ("u:a", 1, RDF_TYPE, "u:T", 1, None, None),
            ("u:a", 1, "u:p", "bad", 2, None, None),
        ]
        df = spark.createDataFrame(
            rows,
            "s string, s_kind tinyint, p string, o string, "
            "o_kind tinyint, o_datatype string, o_lang string")
        rep = shacl_validate(df, """
            @prefix sh: <http://www.w3.org/ns/shacl#> .
            <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
              sh:sparql [ sh:select
                "SELECT $this ?focus WHERE { $this <u:p> ?focus }" ] .
        """).collect()
        assert [r.focus for r in rep] == ["u:a"]
