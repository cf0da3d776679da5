"""C4-style line/page cleaning (ops/text.py::c4_clean)."""
import re

from rdf_spark.ops.text import c4_clean


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _naive(texts, min_words=5, min_lines=3):
    out = {}
    for i, t in texts.items():
        t = t or ""
        lines = t.split("\n")
        kept = [
            ln for ln in lines
            if len([w for w in re.split(r"\s+", ln.strip(" ")) if w])
            >= min_words
            and re.search(r'[.!?]"?$', ln.rstrip(" "))
        ]
        keep = (
            len(kept) >= min_lines
            and "lorem ipsum" not in t.lower()
            and "{" not in t
        )
        out[i] = ("\n".join(kept), len(kept), len(lines) - len(kept), keep)
    return out


def _got(df):
    return {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_dropped, r.keep)
        for r in df.collect()
    }


class TestC4Clean:
    def test_rules(self, spark):
        texts = {
            1: "one two three four five.\nshort line.\n"
               "no terminal punctuation here at all\n"
               'he said "stop right there now!"\n'
               "six seven eight nine ten?\nalpha beta gamma delta eps.",
            2: "lorem ipsum dolor sit amet.\n"
               "aa bb cc dd ee.\naa bb cc dd ff.\naa bb cc dd gg.",
            3: "var x = { a: 1 } indeed yes.\naa bb cc dd ee.\n"
               "aa bb cc dd ff.\naa bb cc dd gg.",
            4: None,
        }
        got = _got(c4_clean(_docs(spark, texts)))
        want = _naive(texts)
        assert got == want
        # doc1 keeps 4 lines (drops the 2-word and no-punct ones)
        assert got[1][1] == 4 and got[1][3] is True
        # lorem ipsum / brace pages are page-dropped but still cleaned
        assert got[2][3] is False and got[2][1] == 4
        assert got[3][3] is False
        assert got[4] == ("", 0, 1, False)

    def test_matches_naive_random(self, spark):
        import random

        rng = random.Random(29)
        words = ["aa", "bb", "cc", "dd", "ee", "ff"]
        ends = [".", "!", "?", '."', "", "x"]
        texts = {}
        for i in range(40):
            lines = [
                " ".join(rng.choice(words)
                         for _ in range(rng.randrange(0, 9)))
                + rng.choice(ends)
                for _ in range(rng.randrange(1, 8))
            ]
            texts[i] = "\n".join(lines)
        for mw, ml in ((5, 3), (3, 2)):
            got = _got(c4_clean(_docs(spark, texts),
                                min_words_per_line=mw, min_lines=ml))
            assert got == _naive(texts, min_words=mw, min_lines=ml)
