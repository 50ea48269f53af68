"""Boilerplate removal: jusText-flavored main-content extraction
from raw HTML — the step between "strip the tags" and "feed the
corpus" that every web-pipeline recipe runs (CCNet uses the WET
extraction, RefinedWeb runs trafilatura; the underlying block
classifier here follows Pomikálek 2011's jusText).

`textclean.html_to_text` keeps EVERYTHING the page renders — nav
bars, cookie banners, footers, related-links rails. Those blocks
share a signature: short, link-dense, stopword-poor. jusText scores
each block-level segment on

- **link density** (chars inside ``<a>`` / chars total),
- **length**, and
- **stopword density** (function words only appear in running prose)

then applies a context pass: short/near-good blocks inherit GOOD
from their neighborhood (a one-line paragraph between two article
paragraphs is article; the same line in a link farm is boilerplate).

Simplifications vs full jusText (documented, deliberate): headings
are ordinary blocks (no heading re-attachment pass), and the context
rules are the common core — ``near-good`` promotes if EITHER nearest
context-free neighbor is good, ``short`` only if BOTH are.

Spark shape: one Arrow-batched pandas UDF (HTML parsing is
irreducibly per-document Python — same stance as
`textclean.html_to_text`); everything downstream of the UDF is
ordinary codegen. The kernel is a closure factory capturing only
locals (the cloudpickle worker-import constraint)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

from .textstats import EN_STOPWORDS

__all__ = ["extract_main_content"]


def _make_main_content_udf(
    stopwords: frozenset,
    max_link_density: float,
    length_low: int,
    length_high: int,
    stopword_low: float,
    stopword_high: float,
):
    from pyspark.sql.functions import pandas_udf

    sw = frozenset(stopwords)
    mld, llow, lhigh = float(max_link_density), int(length_low), int(length_high)
    slow, shigh = float(stopword_low), float(stopword_high)

    def extract(s):
        import re as _re
        from html.parser import HTMLParser

        ws_re = _re.compile(r"\s+")
        BLOCK = {
            "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1",
            "h2", "h3", "h4", "h5", "h6", "section", "article",
            "header", "footer", "blockquote", "pre", "aside", "nav",
        }
        SKIP = {"script", "style", "noscript", "template", "head"}

        class Blocks(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.blocks = []  # [text_parts, link_chars]
                self.cur = [[], 0]
                self.skip_depth = 0
                self.link_depth = 0

            def _flush(self):
                txt = ws_re.sub(" ", "".join(self.cur[0])).strip()
                if txt:
                    self.blocks.append((txt, self.cur[1]))
                self.cur = [[], 0]

            def handle_starttag(self, tag, attrs):
                if tag in SKIP:
                    self.skip_depth += 1
                elif tag == "a":
                    self.link_depth += 1
                elif tag in BLOCK:
                    self._flush()

            def handle_endtag(self, tag):
                if tag in SKIP and self.skip_depth > 0:
                    self.skip_depth -= 1
                elif tag == "a" and self.link_depth > 0:
                    self.link_depth -= 1
                elif tag in BLOCK:
                    self._flush()

            def handle_data(self, data):
                if self.skip_depth == 0 and data:
                    self.cur[0].append(data)
                    if self.link_depth > 0:
                        self.cur[1] += len(data)

        def classify(txt, link_chars):
            n = len(txt)
            if n and link_chars / n > mld:
                return "bad"
            toks = txt.lower().split()
            dens = (
                sum(1 for t in toks if t.strip(".,;:!?\"'()") in sw)
                / len(toks)
                if toks
                else 0.0
            )
            if n < llow:
                return "short"
            if dens >= shigh:
                return "good" if n >= lhigh else "neargood"
            if dens >= slow:
                return "neargood"
            return "bad"

        def one(v):
            if v is None:
                return None
            p = Blocks()
            try:
                p.feed(v)
                p.close()
            except Exception:
                pass
            p._flush()
            blocks = p.blocks
            cls = [classify(t, lc) for t, lc in blocks]
            # context pass over context-free GOOD/BAD anchors
            def anchor(i, step):
                j = i + step
                while 0 <= j < len(cls):
                    if cls[j] in ("good", "bad"):
                        return cls[j]
                    j += step
                return "bad"  # document edge counts as bad (jusText)

            final = []
            for i, c in enumerate(cls):
                if c == "good":
                    final.append(True)
                elif c == "bad":
                    final.append(False)
                else:
                    prev_a, next_a = anchor(i, -1), anchor(i, 1)
                    if c == "neargood":
                        final.append("good" in (prev_a, next_a))
                    else:  # short
                        final.append(prev_a == "good" and next_a == "good")
            return "\n\n".join(
                t for (t, _), keep in zip(blocks, final) if keep
            )

        return s.map(one)

    extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(extract, "string")


def extract_main_content(
    c: Column | str,
    *,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    max_link_density: float = 0.2,
    length_low: int = 70,
    length_high: int = 200,
    stopword_low: float = 0.30,
    stopword_high: float = 0.32,
) -> Column:
    """Main article text from raw HTML: block-segment, score each
    block (link density / length / stopword density — jusText's
    thresholds as defaults), context-promote short and near-good
    blocks sandwiched by good ones, and join the survivors with
    blank lines. NULL in → NULL out; pages with no good block
    (pure link farms) yield ''.

    ``stopwords`` must match the corpus language — pass a
    language-specific set (e.g. from the langid profiles' top tokens)
    for non-English routing; stopword density is the signal that
    separates prose from navigation in every jusText port."""
    col = F.col(c) if isinstance(c, str) else c
    return _make_main_content_udf(
        frozenset(w.lower() for w in stopwords),
        max_link_density,
        length_low,
        length_high,
        stopword_low,
        stopword_high,
    )(col)
