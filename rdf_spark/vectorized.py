"""Vectorized (pandas-level) N-Triples / N-Quads line parsing.

The line formats are embarrassingly parallel (one line = one statement,
no cross-line state — /root/reference/nt.go:22-87, SURVEY.md §3.2), so the
hot path is a single compiled-regex ``Series.str.extract`` over an Arrow
batch; only lines the fast pattern cannot prove safe (escapes, unusual
whitespace, syntax errors) fall back to the exact per-line tokenizer in
:mod:`rdf_spark.parsing`.  The fast pattern is *sound, not complete*: it
only matches lines on which it provably agrees with the slow path (tested
exhaustively against the W3C suites in tests/test_vectorized.py).

No Spark imports here — callers wrap this in ``mapInPandas``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from rdf_spark import parsing, terms
from rdf_spark.chars import (
    _PN_CHARS_RANGES,
    _PN_CHARS_U_RANGES,
)

# IRIREF with a valid RFC2396 scheme, no escapes, no disallowed chars.
# (badIRIRunes rune.go:13; scheme lex.go:517-535.)
_IRI = r"<([A-Za-z][A-Za-z0-9+.\-]*:[^ <>\"{}|^`\\]*)>"
# Blank node label incl. the reference's ':'-in-PN_CHARS_U quirk.
_BN = r"(_:[%s0-9](?:[%s.]*[%s])?)" % (
    _PN_CHARS_U_RANGES,
    _PN_CHARS_RANGES,
    _PN_CHARS_RANGES,
)
# Escape-free literal body.
_LIT = r'"([^"\\]*)"'
_LANG = r"@([A-Za-z]+(?:-[A-Za-z0-9-]+)?)"
_WS = r"[ \t]*"

_NT_FAST = re.compile(
    "^" + _WS
    + "(?:" + _IRI.replace("(", "(?P<s_iri>", 1) + "|" + _BN.replace("(", "(?P<s_bn>", 1) + ")"
    + _WS + _IRI.replace("(", "(?P<p>", 1) + _WS
    + "(?:" + _IRI.replace("(", "(?P<o_iri>", 1) + "|" + _BN.replace("(", "(?P<o_bn>", 1)
    + "|" + _LIT.replace("(", "(?P<o_lit>", 1)
    + "(?:" + _LANG.replace("(", "(?P<lang>", 1)
    + r"|\^\^" + _IRI.replace("(", "(?P<dt>", 1) + ")?" + ")"
    + _WS + r"\.[ \t]*\r?(?:#.*)?$"
)

_NQ_FAST = re.compile(
    "^" + _WS
    + "(?:" + _IRI.replace("(", "(?P<s_iri>", 1) + "|" + _BN.replace("(", "(?P<s_bn>", 1) + ")"
    + _WS + _IRI.replace("(", "(?P<p>", 1) + _WS
    + "(?:" + _IRI.replace("(", "(?P<o_iri>", 1) + "|" + _BN.replace("(", "(?P<o_bn>", 1)
    + "|" + _LIT.replace("(", "(?P<o_lit>", 1)
    + "(?:" + _LANG.replace("(", "(?P<lang>", 1)
    + r"|\^\^" + _IRI.replace("(", "(?P<dt>", 1) + ")?" + ")"
    + _WS + "(?:" + _IRI.replace("(", "(?P<g_iri>", 1) + "|" + _BN.replace("(", "(?P<g_bn>", 1) + ")?"
    + _WS + r"\.[ \t]*\r?(?:#.*)?$"
)

# Lines that produce no statement: blank / comment-only.
_NO_STMT = re.compile(r"^[ \t]*(?:#.*)?\r?$")

_TRIPLE_COLS = terms.TRIPLE_COLS
_QUAD_COLS = terms.QUAD_COLS


def parse_lines(lines: pd.Series, fmt: str = "ntriples") -> pd.DataFrame:
    """Parse a batch of N-Triples/N-Quads lines.

    Returns a DataFrame with the triple (or quad) columns plus an ``err``
    column (None on success); blank/comment lines are dropped.  Callers
    choose strict (raise on any err) vs quarantine semantics.
    """
    quads = fmt == "nquads"
    fast_re = _NQ_FAST if quads else _NT_FAST
    cols = _QUAD_COLS if quads else _TRIPLE_COLS

    lines = lines.astype("object").fillna("")
    keep = ~lines.str.match(_NO_STMT)
    work = lines[keep]
    if len(work) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols + ["err"]})

    ext = work.str.extract(fast_re)
    fast_mask = ext["p"].notna()

    out = pd.DataFrame(index=work.index, columns=cols + ["err"], dtype=object)

    f = ext[fast_mask]
    if len(f):
        s_is_iri = f["s_iri"].notna()
        out.loc[f.index, "s"] = f["s_iri"].where(s_is_iri, f["s_bn"])
        out.loc[f.index, "s_kind"] = np.where(s_is_iri, terms.KIND_IRI, terms.KIND_BLANK)
        out.loc[f.index, "p"] = f["p"]
        o_is_iri = f["o_iri"].notna()
        o_is_bn = f["o_bn"].notna()
        o_is_lit = f["o_lit"].notna()
        out.loc[f.index, "o"] = f["o_iri"].where(o_is_iri, f["o_bn"].where(o_is_bn, f["o_lit"]))
        out.loc[f.index, "o_kind"] = np.where(
            o_is_iri, terms.KIND_IRI, np.where(o_is_bn, terms.KIND_BLANK, terms.KIND_LITERAL)
        )
        has_lang = f["lang"].notna()
        dt = f["dt"].where(f["dt"].notna(), None)
        dt = dt.where(~has_lang, terms.RDF_LANG_STRING)
        dt = dt.where(dt.notna() | ~o_is_lit, terms.XSD_STRING)
        out.loc[f.index, "o_datatype"] = dt.where(o_is_lit | has_lang, None)
        out.loc[f.index, "o_lang"] = f["lang"].where(has_lang, None)
        if quads:
            g_is_iri = f["g_iri"].notna()
            g_is_bn = f["g_bn"].notna()
            g = f["g_iri"].where(g_is_iri, f["g_bn"].where(g_is_bn, terms.DEFAULT_GRAPH))
            out.loc[f.index, "graph"] = g
            out.loc[f.index, "graph_kind"] = np.where(g_is_iri, terms.KIND_IRI, terms.KIND_BLANK)
        out.loc[f.index, "err"] = None

    # slow path: exact tokenizer per line
    slow_idx = work.index[~fast_mask]
    if len(slow_idx):
        parse_one = parsing.parse_nquads if quads else parsing.parse_ntriples
        for i in slow_idx:
            line = work.at[i]
            try:
                rows = parse_one(line)
            except parsing.QUARANTINE_ERRORS as e:
                out.loc[i, "err"] = str(e)
                continue
            if not rows:
                out.drop(index=i, inplace=True)
                continue
            row = rows[0]
            for c, v in zip(cols, row):
                out.at[i, c] = v
            out.at[i, "err"] = None

    return out
