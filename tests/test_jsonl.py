"""JSONL source/sink: pinned-schema read, corrupt-line quarantine,
gzip shard roundtrip, and schema pushdown (no inference pass)."""

import gzip
import json
import os

import pytest

from trial_submission_studio_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_stream,
    split_quarantine,
    write_jsonl,
)

DOCS = [
    {"doc_id": 1, "text": "hello world", "source": "web"},
    {"doc_id": 2, "text": "unicode café über", "source": "books"},
    {"doc_id": 3, "text": None, "source": "web"},
    {"doc_id": 4, "text": "tabs\tand\nnewlines stay encoded", "source": "web"},
]
SCHEMA = "doc_id long, text string, source string"


def _write_fixture(dirpath, rows, bad_lines=(), gz=False):
    os.makedirs(dirpath, exist_ok=True)
    payload = "".join(json.dumps(r, ensure_ascii=False) + "\n" for r in rows)
    payload += "".join(line + "\n" for line in bad_lines)
    name = os.path.join(dirpath, "part-0.jsonl" + (".gz" if gz else ""))
    if gz:
        with gzip.open(name, "wt", encoding="utf-8") as f:
            f.write(payload)
    else:
        with open(name, "w", encoding="utf-8") as f:
            f.write(payload)
    return name


def test_read_jsonl_pinned_schema(spark, tmp_path):
    d = str(tmp_path / "in")
    _write_fixture(d, DOCS)
    df = read_jsonl(spark, d, SCHEMA)
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].text == "hello world"
    assert rows[2].text == "unicode café über"
    assert rows[3].text is None
    assert "and\nnewlines" in rows[4].text
    assert all(r._corrupt_record is None for r in rows.values())


def test_quarantine_split(spark, tmp_path):
    d = str(tmp_path / "in")
    _write_fixture(
        d,
        DOCS,
        bad_lines=['{"doc_id": 5, "text": broken', "not json at all"],
    )
    df = read_jsonl(spark, d, SCHEMA, with_path=True)
    good, bad = split_quarantine(df)
    assert good.count() == 4
    assert "_corrupt_record" not in good.columns
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    raws = {r._corrupt_record for r in bad_rows}
    assert '{"doc_id": 5, "text": broken' in raws
    assert "not json at all" in raws
    # quarantine keeps provenance for targeted re-ingest
    assert all(r._path.endswith("part-0.jsonl") for r in bad_rows)


def test_schema_collision_rejected(spark):
    with pytest.raises(ValueError, match="quarantine column"):
        read_jsonl(spark, "/nonexistent", "a long, _corrupt_record string")


def test_gzip_members_read(spark, tmp_path):
    d = str(tmp_path / "gz")
    _write_fixture(d, DOCS[:2], gz=True)
    _write_fixture(d, DOCS[2:], gz=False)  # mixed plain+gz dir works
    # second gz member
    with gzip.open(os.path.join(d, "part-1.jsonl.gz"), "wt", encoding="utf-8") as f:
        f.write(json.dumps({"doc_id": 9, "text": "from gz two", "source": "web"}) + "\n")
    df = read_jsonl(spark, d, SCHEMA)
    assert df.count() == 5
    assert df.filter("doc_id = 9").first().text == "from gz two"


def test_write_roundtrip_sharded_gzip(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "out")
    write_jsonl(src, out, shards=4)
    names = [n for n in os.listdir(out) if n.startswith("part-")]
    assert len(names) == 4
    assert all(n.endswith(".gz") for n in names)
    back = read_jsonl(spark, out, "doc_id long, text string, source string")
    good, bad = split_quarantine(back)
    assert bad.count() == 0
    orig = src.collect()
    assert good.count() == len(orig)
    # value-faithful roundtrip (unicode, embedded newlines re-encoded)
    assert {(r.doc_id, r.text, r.source) for r in good.collect()} == {
        (r.doc_id, r.text, r.source) for r in orig
    }


def test_quarantine_count_allowed(spark, tmp_path):
    """The formulation's reason to exist: the native JSON datasource's
    internal corrupt column forbids queries pruned to it alone
    (SPARK-21610) — e.g. quarantined.count(). Ours is an ordinary
    computed column; every query shape works."""
    d = str(tmp_path / "in")
    _write_fixture(d, DOCS, bad_lines=["nope", "{broken"])
    good, bad = split_quarantine(read_jsonl(spark, d, SCHEMA))
    assert bad.count() == 2
    assert good.count() == 4


def test_streaming_matches_batch(spark, tmp_path):
    """read_jsonl_stream shares the batch parse plan — the streamed
    result (incl. quarantine rows) equals the batch read of the same
    directory, across two micro-batches."""
    d = str(tmp_path / "in")
    _write_fixture(d, DOCS[:2], bad_lines=["{oops"])
    stream = read_jsonl_stream(spark, d, SCHEMA, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # second member lands mid-stream
        with open(os.path.join(d, "part-1.jsonl"), "w", encoding="utf-8") as f:
            for r in DOCS[2:]:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM jsonl_stream_t").collect()
    finally:
        q.stop()
    batch = read_jsonl(spark, d, SCHEMA).collect()
    key = lambda r: (r.doc_id or -1, r.text or "", r._corrupt_record or "")  # noqa: E731
    assert sorted(streamed, key=key) == sorted(batch, key=key)
    assert sum(1 for r in streamed if r._corrupt_record is not None) == 1


def test_roundtrip_property_adversarial_text(spark, tmp_path):
    """Property: write_jsonl→read_jsonl is value-faithful for
    arbitrary unicode text (control chars, quotes, backslashes,
    newlines — everything JSON must escape), with zero quarantined
    rows."""
    from hypothesis import given, settings, strategies as st

    texts = st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                max_size=80,
            ),
        ),
        min_size=1,
        max_size=10,
    )
    counter = iter(range(10**6))

    @settings(max_examples=8, deadline=None)
    @given(texts)
    def run(vals):
        out = str(tmp_path / f"prop{next(counter)}")
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, text string"
        )
        write_jsonl(df, out, compression=None)
        good, bad = split_quarantine(read_jsonl(spark, out, "doc_id long, text string"))
        assert bad.count() == 0
        got = {r.doc_id: r.text for r in good.collect()}
        assert got == {i: v for i, v in enumerate(vals)}

    run()


def test_fast_path_prunes_parse_schema(spark, tmp_path):
    """quarantine=False: OptimizeJsonExprs must prune the from_json
    parse schema to the referenced fields (a 2-key projection never
    parses the whole document)."""
    d = str(tmp_path / "in")
    _write_fixture(d, DOCS)
    df = read_jsonl(spark, d, SCHEMA, quarantine=False).select("doc_id")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "StructField(doc_id" in plan
    assert "StructField(text" not in plan
    assert "StructField(source" not in plan
    assert df.count() == 4
