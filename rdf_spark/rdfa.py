"""RDFa Lite 1.1 → RDF triples (vocab/prefix/typeof/property/resource).

Completes the embedded-semantics trio next to JSON-LD islands
(ops/html.py) and microdata (microdata.py).  This is the documented
RDFa *Lite* attribute set plus ``about`` and ``content`` — a sound
subset of full RDFa 1.1 processing:

- ``vocab`` sets the default vocabulary for descendant ``property`` /
  ``typeof`` terms; ``prefix="og: http://ogp.me/ns#"`` declares CURIE
  prefixes (both inherited down the tree).
- Subjects: the document (page URL) is the initial subject (RDFa's
  parent object); ``about`` / bare ``resource`` re-anchor it for the
  element's subtree; ``typeof`` mints a new node — the resolved
  ``about``/``resource``/``href``/``src`` IRI when present, else a
  fresh blank node ``_:ra1…`` — emits one ``rdf:type`` per term, and
  becomes the subject for descendants.
- ``property``: predicate terms resolve as absolute IRI > declared
  CURIE > vocab+term (term dropped when no vocabulary applies — spec
  behavior, unlike microdata's urn:md: fallback).  The object is, in
  priority order: the chained new ``typeof`` node on the same element,
  ``resource``/``href``/``src`` as a resolved IRI, ``content`` as a
  literal, else the element's text content (tags stripped, whitespace
  squashed), typed ``xsd:string``.
- NOT implemented (documented): ``rel``/``rev``, ``datatype``,
  ``inlist``, ``graph``; xml:lang is honored on literals.

Same execution shape as the microdata walker: stdlib ``html.parser``
state machine inside an Arrow-batched ``mapInPandas`` stage — narrow,
no shuffle, browser-loose recovery (never raises on malformed HTML).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame

from rdf_spark import terms

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _parse_prefixes(val: str) -> dict[str, str]:
    toks = val.split()
    out = {}
    for i in range(0, len(toks) - 1, 2):
        k = toks[i]
        if k.endswith(":"):
            out[k[:-1]] = toks[i + 1]
    return out


class _Ctx:
    __slots__ = ("subject", "s_kind", "vocab", "prefixes", "lang")

    def __init__(self, subject, s_kind, vocab, prefixes, lang):
        self.subject, self.s_kind = subject, s_kind
        self.vocab, self.prefixes, self.lang = vocab, prefixes, lang


class _Frame:
    __slots__ = ("tag", "collect", "pushed_ctx")

    def __init__(self, tag, collect, pushed_ctx):
        self.tag, self.collect, self.pushed_ctx = tag, collect, pushed_ctx


class _RdfaParser(HTMLParser):
    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.base = base
        self.ctx: list[_Ctx] = [
            _Ctx(base, terms.KIND_IRI, "", {}, None)
        ]
        self.frames: list[_Frame] = []
        self.triples: list[tuple] = []
        self.next_b = 1

    def _resolve_term(self, term: str, ctx: _Ctx) -> str | None:
        if "://" in term:
            return term
        if ":" in term:
            pfx, _, local = term.partition(":")
            ns = ctx.prefixes.get(pfx)
            return ns + local if ns else None
        return ctx.vocab + term if ctx.vocab else None

    def _iri(self, val: str) -> str:
        return urljoin(self.base, val.strip())

    def _emit(self, s, s_kind, p, o, o_kind, dt=None, lang=None):
        self.triples.append((s, s_kind, p, o, o_kind, dt, lang))

    def _emit_text(self, ctx: _Ctx, subject, s_kind, preds, text: str):
        val = " ".join(text.split())
        for p in preds:
            if ctx.lang:
                self._emit(subject, s_kind, p, val, terms.KIND_LITERAL,
                           terms.RDF_LANG_STRING, ctx.lang)
            else:
                self._emit(subject, s_kind, p, val, terms.KIND_LITERAL,
                           terms.XSD_STRING)

    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            a.setdefault(k, "" if v is None else v)
        parent = self.ctx[-1]

        vocab = a["vocab"].strip() if "vocab" in a else parent.vocab
        prefixes = parent.prefixes
        if "prefix" in a:
            prefixes = {**prefixes, **_parse_prefixes(a["prefix"])}
        lang = a.get("xml:lang", a.get("lang", parent.lang)) or None
        ctx = _Ctx(parent.subject, parent.s_kind, vocab, prefixes, lang)

        ref = None  # resolved about/resource/href/src on this element
        for key in ("about", "resource", "href", "src"):
            if a.get(key, "") != "":
                ref = self._iri(a[key])
                break

        prop_terms = (a.get("property") or "").split()
        preds = [
            p for t in prop_terms
            if (p := self._resolve_term(t, ctx)) is not None
        ]
        type_terms = (a.get("typeof") or "").split()

        collect = None
        pushed = False
        if type_terms:
            if ref is not None:
                node, kind = ref, terms.KIND_IRI
            else:
                node, kind = f"_:ra{self.next_b}", terms.KIND_BLANK
                self.next_b += 1
            for t in type_terms:
                ti = self._resolve_term(t, ctx)
                if ti is not None:
                    self._emit(node, kind, terms.RDF_TYPE, ti, terms.KIND_IRI)
            if preds:  # chaining: new node is the object of property
                for p in preds:
                    self._emit(ctx.subject, ctx.s_kind, p, node, kind)
            ctx.subject, ctx.s_kind = node, kind
            pushed = True
        elif preds:
            if ref is not None:
                for p in preds:
                    self._emit(ctx.subject, ctx.s_kind, p, ref, terms.KIND_IRI)
            elif a.get("content", "") != "":
                self._emit_text(ctx, ctx.subject, ctx.s_kind, preds, a["content"])
            elif tag not in _VOID:
                collect = (ctx, ctx.subject, ctx.s_kind, preds, [])
        elif ref is not None and ("about" in a or "resource" in a):
            ctx.subject, ctx.s_kind = ref, terms.KIND_IRI
            pushed = True

        if not pushed and (
            ctx.vocab != parent.vocab
            or ctx.prefixes is not parent.prefixes
            or ctx.lang != parent.lang
        ):
            pushed = True  # context changed even without a new subject

        if tag not in _VOID:
            if pushed:
                self.ctx.append(ctx)
            self.frames.append(_Frame(tag, collect, pushed))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_data(self, data):
        for fr in self.frames:
            if fr.collect is not None:
                fr.collect[4].append(data)

    def _close_frame(self, fr: _Frame):
        if fr.collect is not None:
            ctx, subject, s_kind, preds, parts = fr.collect
            self._emit_text(ctx, subject, s_kind, preds, "".join(parts))
        if fr.pushed_ctx:
            self.ctx.pop()

    def handle_endtag(self, tag):
        if not any(fr.tag == tag for fr in self.frames):
            return
        while self.frames:
            fr = self.frames.pop()
            self._close_frame(fr)
            if fr.tag == tag:
                break

    def finish(self) -> list[tuple]:
        while self.frames:
            self._close_frame(self.frames.pop())
        return self.triples


def parse_rdfa_html(html: str, base: str = "") -> list[tuple]:
    """(s, s_kind, p, o, o_kind, o_datatype, o_lang) in document order."""
    p = _RdfaParser(base)
    p.feed(html)
    p.close()
    return p.finish()


_OUT_DDL = (
    "url string, s string, s_kind tinyint, p string, o string, "
    "o_kind tinyint, o_datatype string, o_lang string, err string"
)


def parse_rdfa(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    base_from_url: bool = True,
) -> DataFrame:
    """RDFa Lite triples for every page (narrow Arrow-batched stage).
    Blank labels are document-scoped ``_:ra1…`` — skolemize (or the
    pipeline's re-namespacing union) before cross-document merges."""
    import pandas as pd

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            cols = ("url", "s", "s_kind", "p", "o", "o_kind",
                    "o_datatype", "o_lang", "err")
            out = {k: [] for k in cols}

            def push(url, s=None, sk=None, p=None, o=None, ok=None,
                     dt=None, lang=None, err=None):
                for k, v in zip(cols, (url, s, sk, p, o, ok, dt, lang, err)):
                    out[k].append(v)

            for url, html in zip(pdf[url_col], pdf[html_col]):
                url = "" if url is None else str(url)
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray, memoryview)):
                    html = bytes(html).decode("utf-8", errors="replace")
                try:
                    rows = parse_rdfa_html(html, base=url if base_from_url else "")
                except Exception as e:  # defensive: keep the batch alive
                    push(url, err=f"rdfa: {e}")
                    continue
                for s, sk, p, o, ok, dt, lang in rows:
                    push(url, s, sk, p, o, ok, dt, lang)
            yield pd.DataFrame(out)

    return pages.mapInPandas(run, _OUT_DDL)
