"""Transcribe the W3C conformance suites inlined in the reference's Go test
files into JSONL fixtures (FIXTURES.md §3).

The suites are DATA (the official W3C RDF 1.1 test corpora, transcribed by
the reference at nt_test.go:325, nq_test.go:50, ttl_test.go:537); this tool
parses the Go composite literals and emits one JSON record per case:

    {"format": ..., "input": ..., "error": bool, "expected": [triple rows]}

triple rows are [s, s_kind, p, o, o_kind, o_datatype, o_lang] (+ graph,
graph_kind for nquads), matching rdf_spark.terms conventions.

Usage: python tools/extract_fixtures.py  (writes tests/fixtures/*.jsonl)
"""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")

XSD = "http://www.w3.org/2001/XMLSchema#"
DATATYPE_IDENTS = {
    "xsdString": XSD + "string",
    "xsdBoolean": XSD + "boolean",
    "xsdDecimal": XSD + "decimal",
    "xsdInteger": XSD + "integer",
    "xsdDouble": XSD + "double",
    "xsdFloat": XSD + "float",
    "xsdDateTime": XSD + "dateTime",
    "xsdByte": XSD + "byte",
    "xsdInt": XSD + "int",
    "rdfLangString": "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
    "xmlLiteral": "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral",
}

KIND_BLANK, KIND_IRI, KIND_LITERAL = 0, 1, 2


class GoLit:
    """Minimal scanner/parser for the Go composite literals used in the
    reference test tables (strings, idents, {...} composites, nil)."""

    def __init__(self, src: str, pos: int):
        self.s = src
        self.i = pos

    def skip_ws(self):
        s, n = self.s, len(self.s)
        while self.i < n:
            c = self.s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif s.startswith("//", self.i):
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith("/*", self.i):
                j = s.find("*/", self.i + 2)
                self.i = n if j < 0 else j + 2
            else:
                return

    def peek(self):
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch):
        self.skip_ws()
        if not self.s.startswith(ch, self.i):
            ctx = self.s[self.i : self.i + 60]
            raise SyntaxError(f"expected {ch!r} at {self.i}: {ctx!r}")
        self.i += len(ch)

    def try_consume(self, ch):
        self.skip_ws()
        if self.s.startswith(ch, self.i):
            self.i += len(ch)
            return True
        return False

    def ident(self):
        self.skip_ws()
        m = re.match(r"(?:\[\])?[A-Za-z_][A-Za-z0-9_.]*", self.s[self.i :])
        if not m:
            raise SyntaxError(f"expected ident at {self.i}: {self.s[self.i:self.i+40]!r}")
        self.i += m.end()
        return m.group()

    def string(self):
        self.skip_ws()
        c = self.s[self.i]
        if c == "`":
            j = self.s.index("`", self.i + 1)
            val = self.s[self.i + 1 : j]
            self.i = j + 1
            return val
        if c != '"':
            raise SyntaxError(f"expected string at {self.i}")
        i = self.i + 1
        out = []
        while True:
            ch = self.s[i]
            if ch == '"':
                self.i = i + 1
                return "".join(out)
            if ch == "\\":
                e = self.s[i + 1]
                if e == "n":
                    out.append("\n")
                elif e == "t":
                    out.append("\t")
                elif e == "r":
                    out.append("\r")
                elif e == "a":
                    out.append("\a")
                elif e == "b":
                    out.append("\b")
                elif e == "f":
                    out.append("\f")
                elif e == "v":
                    out.append("\v")
                elif e == "\\":
                    out.append("\\")
                elif e == '"':
                    out.append('"')
                elif e == "'":
                    out.append("'")
                elif e == "x":
                    out.append(chr(int(self.s[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                elif e == "u":
                    out.append(chr(int(self.s[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                elif e == "U":
                    out.append(chr(int(self.s[i + 2 : i + 10], 16)))
                    i += 10
                    continue
                elif e in "01234567":
                    out.append(chr(int(self.s[i + 1 : i + 4], 8)))
                    i += 4
                    continue
                else:
                    raise SyntaxError(f"unknown escape \\{e}")
                i += 2
                continue
            out.append(ch)
            i += 1

    def value(self):
        """Parse a Go value: string | nil | Ident | Ident{...} | {...}."""
        self.skip_ws()
        c = self.peek()
        if c in "\"`":
            return self.string()
        if c == "{":
            return self.composite(None)
        ident = self.ident()
        if ident == "nil":
            return None
        if self.peek() == "{":
            return self.composite(ident)
        return {"_ident": ident}

    def composite(self, typename):
        self.expect("{")
        fields = {}
        items = []
        while True:
            if self.try_consume("}"):
                break
            self.skip_ws()
            # field name? ident ':' value — but bare values can also be
            # composites/strings; detect `ident:` lookahead
            save = self.i
            name = None
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*\s*:", self.s[self.i :])
            if m and not self.s.startswith(("nil", '"', "`"), self.i):
                name = self.ident()
                self.expect(":")
            else:
                self.i = save
            val = self.value()
            if name:
                fields[name] = val
            else:
                items.append(val)
            if not self.try_consume(","):
                self.expect("}")
                break
        return {"_type": typename, "_fields": fields, "_items": items}


def term_to_row(v):
    """Convert a parsed Term composite to (lex, kind, datatype, lang)."""
    if "_ident" in v:
        if v["_ident"] == "defaultGraph":  # nq_test.go:11
            return ("_:defaultGraph", KIND_BLANK, None, None)
        raise ValueError(f"unknown ident term {v}")
    t = v["_type"]
    f = v["_fields"]
    if t == "IRI":
        return (f["str"], KIND_IRI, None, None)
    if t == "Blank":
        return (f["id"], KIND_BLANK, None, None)
    if t == "Literal":
        dt = f.get("DataType")
        if isinstance(dt, dict) and dt.get("_type") == "IRI":
            dt_str = dt["_fields"]["str"]
        elif isinstance(dt, dict) and "_ident" in dt:
            dt_str = DATATYPE_IDENTS[dt["_ident"]]
        elif dt is None:
            dt_str = DATATYPE_IDENTS["xsdString"]
        else:
            raise ValueError(f"bad DataType: {dt}")
        return (f.get("str", ""), KIND_LITERAL, dt_str, f.get("lang") or None)
    raise ValueError(f"unknown term type {t}")


def triple_to_row(v):
    f = v["_fields"]
    s = term_to_row(f["Subj"])
    p = term_to_row(f["Pred"])
    o = term_to_row(f["Obj"])
    return [s[0], s[1], p[0], o[0], o[1], o[2], o[3]]


def quad_to_row(v):
    # Quad{ Triple{...}, Ctx } — embedded Triple is positional item 0,
    # context positional item 1 (or named Ctx).
    items = v["_items"]
    f = v["_fields"]
    trip = None
    ctx = f.get("Ctx")
    for it in items:
        if isinstance(it, dict) and it.get("_type") == "Triple":
            trip = it
        elif isinstance(it, dict) and ctx is None:
            ctx = it
    if trip is None:
        trip = {"_type": "Triple", "_fields": f, "_items": []}
    row = triple_to_row(trip)
    g = term_to_row(ctx)
    return row + [g[0], g[1]]


def extract_suite(path, var_name, kind):
    src = open(path, encoding="utf-8").read()
    m = re.search(re.escape(var_name) + r"\s*=\s*\[\]struct\s*\{", src)
    if not m:
        raise ValueError(f"{var_name} not found in {path}")
    # skip the struct body to the opening '{' of the slice literal
    brace = src.index("{", m.end() - 1)
    depth = 1
    i = brace + 1
    while depth:
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    p = GoLit(src, i)
    p.expect("{")
    cases = []
    idx = 0
    while not p.try_consume("}"):
        entry = p.composite(None)
        items = entry["_items"]
        inp, err_want, want = items[0], items[1], items[2] if len(items) > 2 else None
        rows = None
        if want is not None:
            conv = quad_to_row if kind == "nquads" else triple_to_row
            rows = [conv(t) for t in want["_items"]]
        cases.append(
            {
                "name": f"{kind}-{idx:04d}",
                "format": kind,
                "input": inp,
                "error": bool(err_want),
                "error_text": err_want or None,
                "expected": rows if not err_want else None,
            }
        )
        idx += 1
        p.try_consume(",")
    return cases


def extract_string_array(path, var_name):
    """Extract a `var X = []string{...}` literal as a list of strings."""
    src = open(path, encoding="utf-8").read()
    m = re.search(re.escape(var_name) + r"\s*=\s*\[\]string\s*\{", src)
    if not m:
        raise ValueError(f"{var_name} not found in {path}")
    p = GoLit(src, m.end() - 1)
    p.expect("{")
    out = []
    while not p.try_consume("}"):
        out.append(p.string())
        p.try_consume(",")
    return out


def extract_rdfxml_suite(path, var_name, kind):
    """Entries are {file, rdfxml, nt, err} — expected output is canonical
    N-Triples text compared after re-encoding (rdfxml_test.go:241-278)."""
    src = open(path, encoding="utf-8").read()
    m = re.search(re.escape(var_name) + r"\s*=\s*\[\]struct\s*\{", src)
    if not m:
        raise ValueError(f"{var_name} not found in {path}")
    brace = src.index("{", m.end() - 1)
    depth, i = 1, brace + 1
    while depth:
        c = src[i]
        depth += c == "{"
        depth -= c == "}"
        i += 1
    p = GoLit(src, i)
    p.expect("{")
    cases = []
    idx = 0
    while not p.try_consume("}"):
        entry = p.composite(None)
        file, rdfxml, nt, err = (entry["_items"] + ["", "", "", ""])[:4]
        cases.append(
            {
                "name": f"{kind}-{idx:04d}",
                "format": "rdfxml",
                "file": file,
                "base": "http://www.w3.org/2013/RDFXMLTests/" + file,
                "input": rdfxml,
                "expected_nt": nt if not err else None,
                "error": bool(err),
                "error_text": err or None,
            }
        )
        idx += 1
        p.try_consume(",")
    return cases


def extract_lexer_tests(path):
    """TestTokens' inline table (lex_test.go:85-398): {input, [(tokType, text)]}."""
    src = open(path, encoding="utf-8").read()
    m = re.search(r"lexTests\s*:=\s*\[\]struct\s*\{", src)
    brace = src.index("{", m.end() - 1)
    depth, i = 1, brace + 1
    while depth:
        depth += src[i] == "{"
        depth -= src[i] == "}"
        i += 1
    p = GoLit(src, i)
    p.expect("{")
    cases = []
    idx = 0
    while not p.try_consume("}"):
        entry = p.composite(None)
        inp = entry["_items"][0]
        toks = [
            [t["_items"][0]["_ident"], t["_items"][1]]
            for t in entry["_items"][1]["_items"]
        ]
        cases.append({"name": f"lex-{idx:04d}", "input": inp, "tokens": toks})
        idx += 1
        p.try_consume(",")
    return cases


def main():
    os.makedirs(OUT, exist_ok=True)
    lex_cases = extract_lexer_tests(os.path.join(REF, "lex_test.go"))
    with open(os.path.join(OUT, "lexer.jsonl"), "w", encoding="utf-8") as f:
        for c in lex_cases:
            f.write(json.dumps(c, ensure_ascii=False) + "\n")
    print(f"lexer token tables: {len(lex_cases)} cases")

    for var, kind in [("rdfxmlExamples", "rdfxml-ex"), ("rdfxmlTestSuite", "rdfxml")]:
        cases = extract_rdfxml_suite(os.path.join(REF, "rdfxml_test.go"), var, kind)
        out_path = os.path.join(OUT, f"{kind.replace('-', '_')}.jsonl")
        with open(out_path, "w", encoding="utf-8") as f:
            for c in cases:
                f.write(json.dumps(c, ensure_ascii=False) + "\n")
        skipped = sum(1 for c in cases if c["error_text"] == "TODO")
        neg = sum(1 for c in cases if c["error"] and c["error_text"] != "TODO")
        print(f"{var}: {len(cases)} cases ({skipped} TODO-skipped, {neg} negative) -> {out_path}")
    # Turtle encoder goldens: decode(ttlBenchInputs[i]) → encode must equal
    # ttlBenchOutputs[i] byte-for-byte (TestEncodingTTL, ttl_test.go:488-514)
    inputs = extract_string_array(os.path.join(REF, "ttl_test.go"), "ttlBenchInputs")
    outputs = extract_string_array(os.path.join(REF, "ttl_test.go"), "ttlBenchOutputs")
    goldens = [
        {"name": f"ttl-encode-{i:02d}", "input": a, "expected": b}
        for i, (a, b) in enumerate(zip(inputs, outputs))
    ]
    with open(os.path.join(OUT, "turtle_encode_goldens.jsonl"), "w", encoding="utf-8") as f:
        for g in goldens:
            f.write(json.dumps(g, ensure_ascii=False) + "\n")
    print(f"turtle-encode goldens: {len(goldens)} cases")

    suites = [
        ("nt_test.go", "ntTestSuite", "ntriples", "ntriples.jsonl"),
        ("nq_test.go", "nqTestSuite", "nquads", "nquads.jsonl"),
        ("ttl_test.go", "ttlTestSuite", "turtle", "turtle.jsonl"),
    ]
    for fname, var, kind, out_name in suites:
        cases = extract_suite(os.path.join(REF, fname), var, kind)
        out_path = os.path.join(OUT, out_name)
        with open(out_path, "w", encoding="utf-8") as f:
            for c in cases:
                f.write(json.dumps(c, ensure_ascii=False) + "\n")
        pos = sum(1 for c in cases if not c["error"])
        print(f"{kind}: {len(cases)} cases ({pos} positive, {len(cases)-pos} negative) -> {out_path}")


if __name__ == "__main__":
    sys.exit(main())
