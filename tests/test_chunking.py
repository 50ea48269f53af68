"""Document chunking: token-budget windows with overlap (row-local,
explode+slice, zero shuffles)."""

import pytest

from trial_submission_studio_spark.operators.chunking import chunk_documents
from trial_submission_studio_spark.sources.local import values_df


def _py_chunks(text, chunk, overlap):
    toks = text.split()
    if not toks:
        return []
    stride = chunk - overlap
    out = []
    start = 0
    while True:
        out.append(" ".join(toks[start : start + chunk]))
        if start + stride >= max(len(toks) - overlap, 1):
            break
        start += stride
    return out


def test_chunking_matches_python_reference(spark):
    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "single"),
        (3, " ".join(f"t{i}" for i in range(7))),
        (4, ""),          # dropped
        (5, None),        # dropped
        (6, " ".join(f"x{i}" for i in range(4))),  # exactly one chunk
    ]
    df = values_df(spark, docs, "doc_id bigint, text string")
    got = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap_tokens=1)
    rows = got.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3, 6}
    for doc_id, text in [(1, docs[0][1]), (2, "single"), (3, docs[2][1]), (6, docs[5][1])]:
        expect = _py_chunks(text, 4, 1)
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert [r.chunk for r in chunks] == expect, doc_id
        assert [r.chunk_id for r in chunks] == list(range(len(expect)))
        assert all(r.n_chunks == len(expect) for r in chunks)
        assert all(r.n_tokens == len(c.split()) for r, c in zip(chunks, expect))


def test_chunking_no_overlap_reconstructs_document(spark):
    text = " ".join(f"w{i}" for i in range(23))
    df = values_df(spark, [(1, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=5).collect(),
        key=lambda r: r.chunk_id,
    )
    assert " ".join(r.chunk for r in rows) == text  # lossless cover
    assert [r.n_tokens for r in rows] == [5, 5, 5, 5, 3]


def test_chunking_overlap_covers_every_span(spark):
    """With overlap o, every o+1-token span lies inside some chunk."""
    text = " ".join(f"w{i}" for i in range(17))
    df = values_df(spark, [(1, text)], "doc_id bigint, text string")
    rows = chunk_documents(df, "doc_id", "text", 6, overlap_tokens=2).collect()
    toks = text.split()
    spans = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    covered = set()
    for r in rows:
        ctoks = r.chunk.split()
        covered.update(" ".join(ctoks[i : i + 3]) for i in range(len(ctoks) - 2))
    assert spans <= covered


def test_chunking_keep_empty_and_validations(spark):
    df = values_df(spark, [(1, None), (2, "a b")], "doc_id bigint, text string")
    rows = chunk_documents(df, "doc_id", "text", 4, drop_empty=False).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    empty = next(r for r in rows if r.doc_id == 1)
    assert empty.chunk == "" and empty.n_tokens == 0 and empty.n_chunks == 1
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, "doc_id", "text", 4, overlap_tokens=4)


def test_chunking_plan_is_shuffle_free(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(df, "doc_id", "text", 64, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
