"""HTML microdata → RDF triples (itemscope/itemtype/itemprop/itemid).

Together with JSON-LD islands (ops/html.py) this covers the two dominant
schema.org carriers on the public web.  The mapping follows the W3C
"Microdata to RDF" note's core algorithm:

- ``itemscope`` opens an item: a blank node ``_:md1…`` (document-scoped,
  pre-increment — same convention as the Turtle parser's ``_:b1``), or
  the resolved ``itemid`` IRI when present.
- ``itemtype`` IRIs become ``rdf:type`` triples and set the item's
  *vocabulary* (the type IRI up to and including its last ``/`` or
  ``#``).  Untyped nested items INHERIT the enclosing item's vocabulary
  (spec §4: "current vocabulary" propagation).
- ``itemprop="a b"`` emits one triple per name against the innermost
  open item.  Property IRIs: absolute names (containing ``://``) pass
  through; otherwise vocabulary + name; for items with no vocabulary in
  scope, ``urn:md:`` + name (documented deviation from the note's
  http://www.w3.org/ns/md lookup — no registry fetches in a batch
  pipeline).
- Values per element kind: ``a/area/link`` → resolved ``href`` as IRI,
  ``img/audio/video/source/iframe/embed/track`` → resolved ``src`` as
  IRI, ``meta`` → ``content``, ``time`` → ``datetime`` (falling back to
  text), ``data`` → ``value``, an element that is itself ``itemscope``
  → the nested item node; anything else → its text content with tags
  stripped and whitespace squashed, typed ``xsd:string``.
- ``itemref`` is NOT supported (sound-not-complete: it requires a
  second resolution pass over out-of-tree nodes; rows using it simply
  miss those properties).

Parsing uses the stdlib ``html.parser`` state machine — per-document
imperative logic, so the Spark stage is the same Arrow-batched
``mapInPandas`` shape as the other document decoders (narrow, no
shuffle, one Python pass per page).  Unclosed elements at EOF flush
their pending text properties; stray end tags are ignored (browser-like
loose recovery, never an exception).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame

from rdf_spark import terms

_IRI_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "img": "src", "audio": "src", "video": "src", "source": "src",
    "iframe": "src", "embed": "src", "track": "src",
}
_LITERAL_ATTR = {"meta": "content", "time": "datetime", "data": "value"}
# void elements never get an end tag — they must not push a frame
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _vocab_of(type_iri: str) -> str:
    for sep in ("#", "/"):
        i = type_iri.rfind(sep)
        if i >= 0:
            return type_iri[: i + 1]
    return type_iri


class _Item:
    __slots__ = ("node", "kind", "vocab")

    def __init__(self, node: str, kind: int, vocab: str):
        self.node, self.kind, self.vocab = node, kind, vocab


class _Frame:
    __slots__ = ("tag", "opened_item", "collect")

    def __init__(self, tag: str, opened_item: bool, collect):
        self.tag = tag
        self.opened_item = opened_item
        self.collect = collect  # None | (item, [pred…], [text parts])


class _MicrodataParser(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.items: list[_Item] = []
        self.frames: list[_Frame] = []
        self.triples: list[tuple] = []
        self.next_b = 1

    # -- helpers ---------------------------------------------------------
    def _pred(self, item: _Item, name: str) -> str:
        if "://" in name:
            return name
        if item.vocab:
            return item.vocab + name
        return "urn:md:" + name

    def _emit(self, s: _Item, p: str, o: str, o_kind: int, dt=None):
        self.triples.append(
            (s.node, s.kind, p, o, o_kind, dt, None)
        )

    def _emit_literal(self, item: _Item, preds: list[str], text: str):
        val = " ".join(text.split())
        for p in preds:
            self._emit(item, p, val, terms.KIND_LITERAL, terms.XSD_STRING)

    # -- tag events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            a.setdefault(k, "" if v is None else v)
        names = (a.get("itemprop") or "").split()
        parent = self.items[-1] if self.items else None

        opened = None
        if "itemscope" in a:
            types = (a.get("itemtype") or "").split()
            vocab = _vocab_of(types[0]) if types else (parent.vocab if parent else "")
            if "itemid" in a and a["itemid"].strip():
                node = _Item(urljoin(self.base, a["itemid"].strip()), terms.KIND_IRI, vocab)
            else:
                node = _Item(f"_:md{self.next_b}", terms.KIND_BLANK, vocab)
                self.next_b += 1
            for t in types:
                self._emit(node, terms.RDF_TYPE, t, terms.KIND_IRI)
            opened = node

        collect = None
        if names and parent is not None:
            preds = [self._pred(parent, n) for n in names]
            if opened is not None:
                for p in preds:
                    self._emit(parent, p, opened.node, opened.kind)
            elif tag in _IRI_ATTR and a.get(_IRI_ATTR[tag], "") != "":
                o = urljoin(self.base, a[_IRI_ATTR[tag]])
                for p in preds:
                    self._emit(parent, p, o, terms.KIND_IRI)
            elif tag in _LITERAL_ATTR and a.get(_LITERAL_ATTR[tag], "") != "":
                self._emit_literal(parent, preds, a[_LITERAL_ATTR[tag]])
            elif tag in _VOID:
                self._emit_literal(parent, preds, "")  # valueless void prop
            else:
                collect = (parent, preds, [])

        if opened is not None:
            self.items.append(opened)
        if tag not in _VOID:
            self.frames.append(_Frame(tag, opened is not None, collect))
        elif opened is not None:
            # itemscope on a void element: item closes immediately
            self.items.pop()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_data(self, data):
        for fr in self.frames:
            if fr.collect is not None:
                fr.collect[2].append(data)

    def _close_frame(self, fr: _Frame):
        if fr.collect is not None:
            item, preds, parts = fr.collect
            self._emit_literal(item, preds, "".join(parts))
        if fr.opened_item:
            self.items.pop()

    def handle_endtag(self, tag):
        if not any(fr.tag == tag for fr in self.frames):
            return  # stray end tag: ignore (loose recovery)
        while self.frames:
            fr = self.frames.pop()
            self._close_frame(fr)
            if fr.tag == tag:
                break

    def finish(self) -> list[tuple]:
        while self.frames:  # unclosed elements at EOF
            self._close_frame(self.frames.pop())
        return self.triples


def parse_microdata_html(html: str, base: str = "") -> list[tuple]:
    """(s, s_kind, p, o, o_kind, o_datatype, o_lang) tuples in document
    order.  Never raises on malformed HTML (browser-like recovery)."""
    p = _MicrodataParser(base)
    p.feed(html)
    p.close()
    return p.finish()


_OUT_DDL = (
    "url string, s string, s_kind tinyint, p string, o string, "
    "o_kind tinyint, o_datatype string, o_lang string, err string"
)


def parse_microdata(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    base_from_url: bool = True,
) -> DataFrame:
    """Microdata triples for every page (narrow Arrow-batched stage; one
    Python pass per document, no shuffle).  Pages without any
    ``itemscope`` contribute no rows.  Blank labels are document-scoped
    ``_:md1…`` — run :func:`rdf_spark.canonical.skolemize` (or the
    pipeline's re-namespacing union) before cross-document merges."""
    import pandas as pd

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {k: [] for k in (
                "url", "s", "s_kind", "p", "o", "o_kind",
                "o_datatype", "o_lang", "err",
            )}

            def push(url, s=None, s_kind=None, p=None, o=None,
                     o_kind=None, dt=None, lang=None, err=None):
                out["url"].append(url)
                out["s"].append(s)
                out["s_kind"].append(s_kind)
                out["p"].append(p)
                out["o"].append(o)
                out["o_kind"].append(o_kind)
                out["o_datatype"].append(dt)
                out["o_lang"].append(lang)
                out["err"].append(err)

            for url, html in zip(pdf[url_col], pdf[html_col]):
                url = "" if url is None else str(url)
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray, memoryview)):
                    html = bytes(html).decode("utf-8", errors="replace")
                try:
                    rows = parse_microdata_html(
                        html, base=url if base_from_url else ""
                    )
                except Exception as e:  # defensive: keep the batch alive
                    push(url, err=f"microdata: {e}")
                    continue
                for s, sk, p, o, ok, dt, lang in rows:
                    push(url, s, sk, p, o, ok, dt, lang)
            yield pd.DataFrame(out)

    return pages.mapInPandas(run, _OUT_DDL)
