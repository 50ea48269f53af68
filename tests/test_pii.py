"""PII detection / redaction (operators/pii.py).

Python-reference parity: counts and redactions are checked against
Python `re` on the same patterns (the patterns avoid every construct
where Java regex, RE2, and Python `re` could disagree — no
lookaround, no backrefs, ASCII classes only), plus a DuckDB
cross-engine pin since the oracle gate runs there.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.pii import (
    PII_PATTERNS,
    luhn_valid,
    pii_counts,
    pii_filter,
    redact_pii,
)

SAMPLES = [
    (1, "contact jane.doe+spam@example.co.uk or bob@x.io today"),
    (2, "server at 192.168.0.1 and 10.255.255.254, not 999.1.1.1"),
    (3, "ssn 123-45-6789 on file"),
    (4, "card 4111 1111 1111 1111 exp 12/26"),
    (5, "call (415) 555-0123 or +1 415-555-0199"),
    (6, "no pii here, just words and 12345"),
    (7, None),
    (8, "mixed: a@b.com 10.0.0.1 123-45-6789 4111-1111-1111-1111 415-555-0123"),
]


def _py_count(text, pat):
    return 0 if text is None else len(re.findall(pat, text))


def _py_redact(text):
    if text is None:
        return None
    for name, pat in PII_PATTERNS.items():
        text = re.sub(pat, f"[{name.upper()}]", text)
    return text


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


def test_counts_match_python_reference(pii_df):
    got = {
        r["doc_id"]: r
        for r in pii_counts(pii_df, "text").collect()
    }
    for doc_id, text in SAMPLES:
        for name, pat in PII_PATTERNS.items():
            assert got[doc_id][f"pii_{name}"] == _py_count(text, pat), (
                doc_id,
                name,
            )
        assert got[doc_id]["pii_total"] == sum(
            _py_count(text, p) for p in PII_PATTERNS.values()
        )


def test_expected_hits_per_class(pii_df):
    got = {r["doc_id"]: r for r in pii_counts(pii_df, "text").collect()}
    assert got[1]["pii_email"] == 2
    assert got[2]["pii_ipv4"] == 2  # 999.1.1.1 must NOT match
    assert got[3]["pii_ssn"] == 1
    assert got[4]["pii_credit_card"] == 1
    assert got[5]["pii_phone"] == 2
    assert got[6]["pii_total"] == 0
    assert got[7]["pii_total"] == 0
    assert got[8]["pii_total"] >= 5


def test_redaction_matches_python_reference(pii_df):
    got = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id", redact_pii("text").alias("red")
        ).collect()
    }
    for doc_id, text in SAMPLES:
        assert got[doc_id] == _py_redact(text), doc_id
    # and nothing PII-shaped survives redaction
    for doc_id, text in SAMPLES:
        if text is None:
            continue
        for pat in PII_PATTERNS.values():
            assert not re.findall(pat, got[doc_id]), (doc_id, pat)


def test_duckdb_cross_engine_parity(pii_df):
    """The oracle gate runs these patterns in DuckDB (RE2) — pin that
    counts and redacted text agree engine-for-engine."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if tx is None else repr(tx)})"
            for i, tx in SAMPLES
        )
        + ") AS v(doc_id, text)"
    )
    spark_counts = {
        r["doc_id"]: tuple(r[f"pii_{n}"] for n in PII_PATTERNS)
        for r in pii_counts(pii_df, "text").collect()
    }
    red_expr = "text"
    for name, pat in PII_PATTERNS.items():
        red_expr = (
            f"regexp_replace({red_expr}, '{pat}', '[{name.upper()}]', 'g')"
        )
    count_exprs = ", ".join(
        f"coalesce(len(regexp_extract_all(text, '{pat}')), 0)"
        for pat in PII_PATTERNS.values()
    )
    duck = {
        row[0]: (tuple(row[1:-1]), row[-1])
        for row in con.execute(
            f"SELECT doc_id, {count_exprs}, {red_expr} FROM t"
        ).fetchall()
    }
    spark_red = {
        r["doc_id"]: r["red"]
        for r in pii_df.select("doc_id", redact_pii("text").alias("red")).collect()
    }
    for doc_id, _ in SAMPLES:
        assert tuple(duck[doc_id][0]) == spark_counts[doc_id], doc_id
        assert duck[doc_id][1] == spark_red[doc_id], doc_id


def test_luhn(spark):
    cases = [
        ("4111 1111 1111 1111", True),   # classic Visa test number
        ("4111-1111-1111-1112", False),  # bad check digit
        ("79927398713", False),          # Luhn-valid but only 11 digits
        ("4222222222222", True),         # 13-digit Visa test number
        ("", False),
        (None, False),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i long, cc string"
    )
    got = {
        r["i"]: bool(r["ok"])
        for r in df.select("i", F.coalesce(luhn_valid("cc"), F.lit(False)).alias("ok")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, cases[i]


def test_pii_filter(pii_df):
    kept = pii_filter(pii_df, "text").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [6, 7]
    # threshold keeps low-PII docs
    kept2 = pii_filter(pii_df, "text", max_total=1).select("doc_id").collect()
    assert 3 in {r["doc_id"] for r in kept2}


def test_classes_subset_and_unknown(pii_df):
    out = pii_counts(pii_df, "text", classes=["email"])
    assert "pii_email" in out.columns and "pii_phone" not in out.columns
    with pytest.raises(ValueError):
        pii_counts(pii_df, "text", classes=["nope"])


def test_no_shuffle_plan(pii_df):
    """Row-local stage: the counts+redaction plan must contain no
    exchange."""
    plan = pii_counts(pii_df, "text").withColumn(
        "red", redact_pii("text")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pseudonymize_is_consistent_and_salted(spark):
    """Consistent pseudonymization: the same value tokens identically
    everywhere (within and across documents), different values get
    different tokens, a salt change rekeys the whole mapping, and
    exact-dedup equality survives the scrub."""
    from trial_submission_studio_spark.operators.pii import pseudonymize_pii

    rows = [
        (1, "mail a@x.com and again a@x.com plus b@y.org"),
        (2, "reply to a@x.com from 10.0.0.1"),
        (3, "mail a@x.com and again a@x.com plus b@y.org"),  # dup of 1
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", pseudonymize_pii("text").alias("p")
        ).collect()
    }
    import re

    toks1 = re.findall(r"<EMAIL_[0-9a-f]{8}>", got[1])
    assert len(toks1) == 3
    assert toks1[0] == toks1[1]          # same email, same token
    assert toks1[0] != toks1[2]          # different email differs
    assert toks1[0] in got[2]            # cross-document consistency
    assert "<IPV4_" in got[2]
    assert got[1] == got[3]              # dedup equality survives
    assert got[4] is None                # NULL stays NULL
    assert "a@x.com" not in got[1] and "b@y.org" not in got[1]

    # salt rekeys the mapping
    resalted = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", pseudonymize_pii("text", salt="v2").alias("p")
        ).collect()
    }
    assert resalted[1] != got[1]
    assert re.findall(r"<EMAIL_[0-9a-f]{8}>", resalted[1])[0] != toks1[0]

    with pytest.raises(ValueError, match="hash_chars"):
        df.select(pseudonymize_pii("text", hash_chars=2))


def test_pseudonymize_all_classes_no_python(spark):
    """Every detector class pseudonymizes; the plan is pure JVM (no
    Python eval nodes of any kind)."""
    from trial_submission_studio_spark.operators.pii import pseudonymize_pii

    text = (
        "card 4111-1111-1111-1111, ssn 123-45-6789, call 555-867-5309, "
        "ip 192.168.1.1, mail x@y.zz done"
    )
    df = spark.createDataFrame([(text,)], "text string")
    q = df.select(pseudonymize_pii("text").alias("p"))
    out = q.collect()[0]["p"]
    for cls in ("CREDIT_CARD", "SSN", "PHONE", "IPV4", "EMAIL"):
        assert f"<{cls}_" in out, out
    assert "4111" not in out and "867" not in out and "x@y.zz" not in out
    assert out.endswith("done")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
