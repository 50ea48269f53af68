"""Text cleaning / PII scrubbing for training-data pipelines.

Every scrubber is a pure JVM ``regexp_replace`` expression (whole-stage
codegen, no Python in the hot path) except Unicode NFC/NFKC
normalization, which Spark has no builtin for and runs as an
Arrow-batched pandas UDF. Compose with
:func:`~trial_submission_studio_spark.operators.textstats.quality_score`
and the dedup family for a full pre-training cleaning pass.

Patterns deliberately favor precision over recall (a training-corpus
scrubber that eats code snippets or dates does more harm than a missed
edge case); each is independently toggleable.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves stringified pd.Series hints
from pyspark.sql import Column
from pyspark.sql import functions as F

#: replacement tokens — stable, greppable, unlikely in natural text
URL_TOKEN = "<|url|>"
EMAIL_TOKEN = "<|email|>"
PHONE_TOKEN = "<|phone|>"
IP_TOKEN = "<|ip|>"

_URL_RE = r"(?i)\b(?:https?://|www\.)[^\s<>\"']+"
_EMAIL_RE = r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"
# explicit phone shapes only (intl +..., (NXX) grouping, 3-3-4 dashes,
# space-grouped national) — a bare "7+ digits with separators" pattern
# also eats ISO dates (4-2-2 grouping), so shapes are enumerated
_PHONE_RE = (
    r"(?:\+\d[\d\s().-]{5,}\d)"
    r"|(?:\(\d{3}\)[\s.-]?\d{3}[\s.-]\d{4})"
    r"|(?:\b\d{3}[\s.-]\d{3}[\s.-]\d{4}\b)"
    r"|(?:\b\d{2,4}\s\d{3,4}\s\d{3,4}\b)"
)
_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_HTML_TAG_RE = r"<[^>\s][^>]*>"
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def scrub_urls(c: Column | str, token: str = URL_TOKEN) -> Column:
    return F.regexp_replace(_col(c).cast("string"), _URL_RE, token)


def scrub_emails(c: Column | str, token: str = EMAIL_TOKEN) -> Column:
    return F.regexp_replace(_col(c).cast("string"), _EMAIL_RE, token)


def scrub_phones(c: Column | str, token: str = PHONE_TOKEN) -> Column:
    """Conservative phone scrub: digit runs (7+) with phone-style
    separators. Applied AFTER url/email scrubbing so numbers inside
    those don't double-fire."""
    return F.regexp_replace(_col(c).cast("string"), _PHONE_RE, token)


def scrub_ipv4(c: Column | str, token: str = IP_TOKEN) -> Column:
    return F.regexp_replace(_col(c).cast("string"), _IPV4_RE, token)


def strip_html(c: Column | str) -> Column:
    """Drop HTML/XML tags (not entities) and collapse the whitespace
    the removal leaves behind."""
    out = F.regexp_replace(_col(c).cast("string"), _HTML_TAG_RE, " ")
    return F.trim(F.regexp_replace(out, r"\s{2,}", " "))


def strip_control_chars(c: Column | str) -> Column:
    """Remove C0/C1 control bytes except tab/newline/CR."""
    return F.regexp_replace(_col(c).cast("string"), _CONTROL_RE, "")


def scrub_pii(
    c: Column | str,
    urls: bool = True,
    emails: bool = True,
    phones: bool = True,
    ips: bool = True,
) -> Column:
    """The composed scrubbing pass, one codegen'd expression chain.
    Order matters: URLs first (their paths contain digit runs and
    @-tokens), then emails, then IPs, then the conservative phone
    pattern."""
    out = _col(c).cast("string")
    if urls:
        out = F.regexp_replace(out, _URL_RE, URL_TOKEN)
    if emails:
        out = F.regexp_replace(out, _EMAIL_RE, EMAIL_TOKEN)
    if ips:
        out = F.regexp_replace(out, _IPV4_RE, IP_TOKEN)
    if phones:
        out = F.regexp_replace(out, _PHONE_RE, PHONE_TOKEN)
    return out


def _make_nfc_udf(form: str):
    """Arrow-batched Unicode normalization (closure factory — the
    worker cannot import this package). Type-hint pandas_udf form;
    annotations are assigned as real class objects because ``from
    __future__ import annotations`` stringifies inline hints beyond
    pyspark's signature-based resolver."""
    from pyspark.sql.functions import pandas_udf

    def nfc(s):
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(nfc, "string")


def normalize_unicode(c: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the one Python
    step, Arrow-batched; run it once at ingest, not per-operator."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError("form must be NFC|NFKC|NFD|NFKD")
    return _make_nfc_udf(form)(_col(c).cast("string"))


def _make_mojibake_udf(max_passes: int):
    """Arrow-batched mojibake repair (closure factory — same worker
    import constraint as the NFC udf)."""
    from pyspark.sql.functions import pandas_udf

    def fix(s):
        def one(v):
            if v is None:
                return None
            for _ in range(max_passes):
                # mojibake signature: characters that are really the
                # latin-1/cp1252 rendering of UTF-8 bytes. A clean
                # string round-trips to the SAME string or fails the
                # strict latin-1 encode; a mojibake string decodes to
                # something shorter/different — accept only when the
                # roundtrip CHANGES the text, else stop.
                try:
                    repaired = v.encode("cp1252", errors="strict").decode(
                        "utf-8", errors="strict"
                    )
                except (UnicodeEncodeError, UnicodeDecodeError):
                    return v
                if repaired == v:
                    return v
                v = repaired
            return v

        return s.map(one)

    fix.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(fix, "string")


def fix_mojibake(c: Column | str, max_passes: int = 3) -> Column:
    """Repair double-encoded UTF-8 ("Ã©" → "é"), including N-times
    re-encoded text (up to ``max_passes``). Conservative: a string is
    only rewritten when the cp1252→UTF-8 roundtrip decodes STRICTLY
    and produces different text — clean text (any script) never
    round-trips through that path, so false repairs are limited to
    strings that are byte-for-byte valid mojibake. Arrow-batched like
    :func:`normalize_unicode`; run once at ingest.
    """
    if max_passes < 1:
        raise ValueError("max_passes must be >= 1")
    return _make_mojibake_udf(max_passes)(_col(c).cast("string"))


def _make_html_text_udf():
    """Arrow-batched HTML→text extraction (closure factory — same
    worker import constraint as the NFC udf)."""
    from pyspark.sql.functions import pandas_udf

    def extract(s):
        import re as _re
        from html.parser import HTMLParser

        ws_re = _re.compile(r"[ \t]+")
        nl_re = _re.compile(r"\n{3,}")
        BLOCK = {
            "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1",
            "h2", "h3", "h4", "h5", "h6", "section", "article",
            "header", "footer", "blockquote", "pre",
        }
        SKIP = {"script", "style", "noscript", "template", "head"}

        class TextExtractor(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts = []
                self.skip_depth = 0

            def handle_starttag(self, tag, attrs):
                if tag in SKIP:
                    self.skip_depth += 1
                elif tag in BLOCK:
                    self.parts.append("\n")

            def handle_endtag(self, tag):
                if tag in SKIP and self.skip_depth > 0:
                    self.skip_depth -= 1
                elif tag in BLOCK:
                    self.parts.append("\n")

            def handle_data(self, data):
                if self.skip_depth == 0 and data:
                    self.parts.append(data)

        def one(v):
            if v is None:
                return None
            p = TextExtractor()
            try:
                p.feed(v)
                p.close()
            except Exception:
                pass  # keep whatever was extracted from malformed HTML
            text = ws_re.sub(" ", "".join(p.parts))
            lines = [ln.strip() for ln in text.split("\n")]
            return nl_re.sub("\n\n", "\n".join(lines)).strip()

        return s.map(one)

    extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(extract, "string")


def _make_html_links_udf():
    """Arrow-batched <a href> extraction (closure factory — same
    worker import constraint as the NFC udf). Two string inputs
    (html, base_url); base resolves relative hrefs and may be
    NULL."""
    from pyspark.sql.functions import pandas_udf

    def extract(html_s, base_s):
        from html.parser import HTMLParser
        from urllib.parse import urljoin

        class LinkExtractor(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.hrefs = []

            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    for k, v in attrs:
                        if k == "href" and v:
                            self.hrefs.append(v)

        def one(v, base):
            if v is None:
                return None
            p = LinkExtractor()
            try:
                p.feed(v)
                p.close()
            except Exception:
                pass  # keep whatever was extracted from malformed HTML
            out = []
            for h in p.hrefs:
                try:
                    u = urljoin(base, h) if base else h
                except ValueError:
                    continue
                if u.startswith(("http://", "https://")):
                    out.append(u)
            return out

        import pandas as pd

        return pd.Series(
            [one(v, b) for v, b in zip(html_s, base_s)], dtype="object"
        )

    extract.__annotations__ = {
        "html_s": pd.Series,
        "base_s": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(extract, "array<string>")


def html_links(c: Column | str, base_url: Column | str | None = None) -> Column:
    """Outbound links of an HTML page (``array<string>``): every
    ``<a href>``, resolved against ``base_url`` when given (so
    relative hrefs become absolute), filtered to http(s).

    The crawl-graph feeder: WARC page → hrefs → (explode +
    ``urls.url_registered_domain``) → domain edge list →
    ``graph.pagerank``. Arrow-batched stdlib ``html.parser``, a
    designated Python op like :func:`html_to_text`."""
    base = (
        F.lit(None).cast("string")
        if base_url is None
        else _col(base_url).cast("string")
    )
    return _make_html_links_udf()(_col(c).cast("string"), base)


def html_to_text(c: Column | str) -> Column:
    """Boilerplate-aware HTML→text: drops script/style/head subtrees,
    breaks block elements into lines, decodes entities, collapses
    whitespace — the real-parser upgrade of :func:`strip_html` (which
    stays as the cheap codegen tag-regex for already-clean text). The
    WARC ingestion pair: ``read_warc`` yields raw page HTML in
    ``text``; this turns it into corpus documents. Arrow-batched
    stdlib ``html.parser`` — a designated Python op like NFC."""
    return _make_html_text_udf()(_col(c).cast("string"))


def _make_html_anchor_links_udf():
    """Arrow-batched <a href> + anchor-text extraction (closure
    factory). Output per row: array<struct<href, anchor>> — anchor is
    the whitespace-collapsed text content of the <a> element."""
    from pyspark.sql.functions import pandas_udf

    def extract(html_s, base_s):
        import re
        from html.parser import HTMLParser
        from urllib.parse import urljoin

        class AnchorExtractor(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.out = []
                self._href = None
                self._buf = []
                self._depth = 0

            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    if self._href is not None:
                        self._flush()  # nested/unclosed <a>
                    self._href = None
                    self._buf = []
                    self._depth = 1
                    for k, v in attrs:
                        if k == "href" and v:
                            self._href = v

            def handle_endtag(self, tag):
                if tag == "a" and self._depth:
                    self._flush()

            def handle_data(self, data):
                if self._depth:
                    self._buf.append(data)

            def _flush(self):
                if self._href is not None:
                    text = re.sub(r"\s+", " ", "".join(self._buf)).strip()
                    self.out.append((self._href, text))
                self._href = None
                self._buf = []
                self._depth = 0

        def one(v, base):
            if v is None:
                return None
            p = AnchorExtractor()
            try:
                p.feed(v)
                p.close()
            except Exception:
                pass
            p._flush()  # unclosed trailing <a>
            rows = []
            for h, text in p.out:
                try:
                    u = urljoin(base, h) if base else h
                except ValueError:
                    continue
                if u.startswith(("http://", "https://")):
                    rows.append({"href": u, "anchor": text})
            return rows

        import pandas as pd

        return pd.Series(
            [one(v, b) for v, b in zip(html_s, base_s)], dtype="object"
        )

    return pandas_udf("array<struct<href string, anchor string>>")(extract)


def html_anchor_links(c: Column | str, base_url: Column | str | None = None) -> Column:
    """Outbound links WITH their anchor text
    (``array<struct<href, anchor>>``): the anchor-text signal is a
    classic web-scale relevance/quality feature — the text OTHER
    pages use to describe a target. Same parser discipline as
    :func:`html_links`; compose with ``explode`` + a groupBy on
    ``href`` for a per-target anchor-text table:

    >>> pages.select(F.explode(html_anchor_links("html", "url")).alias("l"))
    ...      .groupBy("l.href").agg(F.collect_list("l.anchor"))
    """
    base = (
        F.lit(None).cast("string")
        if base_url is None
        else _col(base_url).cast("string")
    )
    return _make_html_anchor_links_udf()(_col(c).cast("string"), base)
