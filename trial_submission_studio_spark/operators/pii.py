"""PII detection and redaction — the privacy-scrub stage of a
training-data pipeline.

Public corpus recipes scrub personally-identifiable information
before training: The Stack / StarCoder redact emails + IP addresses,
RedPajama/FineWeb pipelines add phone numbers and ID-shaped digit
runs. This module implements that stage as pure codegen expressions
(regexp_extract_all / regexp_replace chains) — zero shuffle, zero
Python in the hot path; at 100 TB it streams through the scan like
any row-local filter.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no PII surface — clinical
submissions PSEUDONYMIZE by construction (USUBJID). This extends the
text/curation family (SURVEY.md §2.13) for the LLM-pipeline track.

Engine-portability contract (the DuckDB oracle runs the SAME
patterns): every built-in pattern avoids lookaround and backrefs
(RE2 has neither), uses explicit ``[0-9]`` classes, and relies only
on ``\\b`` word boundaries — constructs Java regex and RE2 evaluate
identically, so counts and redactions hash-match across engines.

The one deliberately Spark-only extra is :func:`luhn_valid` — a
checksum cannot be a regex, so it's an expression-level fold
(``filter``/``aggregate`` over the digit array, still whole-stage
codegen) used to cut false-positive credit-card hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "pseudonymize_pii",
    "luhn_valid",
    "pii_filter",
]

#: detection patterns, in REDACTION ORDER: structured tokens first
#: (email, ip, ssn), long digit runs (credit_card) before the
#: shorter phone shape so a card number never half-redacts as a
#: phone number. dict order is semantic — don't sort.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
    ),
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}[ \-]?[0-9]{4}[ \-]?[0-9]{4}[ \-]?[0-9]{2,4}\b",
    # two alternatives because \b can't sit before "+" or "(" (no
    # word boundary between a space and a non-word char): one for
    # +country/parenthesized forms (anchored by the literal + or (),
    # one \b-anchored bare NNN-NNN-NNNN; the final separator is
    # REQUIRED so plain 10-digit runs (ids, card fragments) don't
    # false-positive
    "phone": (
        r"(?:\+[0-9]{1,2}[ .\-]?\(?|\()[0-9]{3}\)?[ .\-]?[0-9]{3}[ .\-][0-9]{4}\b"
        r"|\b[0-9]{3}[ .\-]?[0-9]{3}[ .\-][0-9]{4}\b"
    ),
}


def _classes(classes) -> list[str]:
    if classes is None:
        return list(PII_PATTERNS)
    bad = [c for c in classes if c not in PII_PATTERNS]
    if bad:
        raise ValueError(f"unknown PII classes {bad}; known: {list(PII_PATTERNS)}")
    return list(classes)


def pii_counts(
    df: DataFrame, text_col: str, classes: list[str] | None = None
) -> DataFrame:
    """Append one ``pii_<class>`` long column per detector (match
    count on the ORIGINAL text — classes count independently, so an
    SSN inside a longer digit run can tally under two classes) plus
    ``pii_total``. NULL text counts 0 everywhere."""
    out = df
    names = _classes(classes)
    for name in names:
        # size(NULL) is -1 under Spark's default (non-ANSI) mode, so
        # guard on the text itself rather than coalescing the size
        out = out.withColumn(
            f"pii_{name}",
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(
                F.size(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(PII_PATTERNS[name]), F.lit(0)
                    )
                )
            )
            .cast("long"),
        )
    total = None
    for name in names:
        c = F.col(f"pii_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total.cast("long"))


def redact_pii(
    c: Column | str,
    classes: list[str] | None = None,
    template: str = "[{NAME}]",
) -> Column:
    """Redacted-text expression: chained ``regexp_replace`` in
    :data:`PII_PATTERNS` order (structured → long-digit → phone).
    ``template`` receives the UPPER-CASE class name. NULL stays
    NULL."""
    out = F.col(c) if isinstance(c, str) else c
    for name in _classes(classes):
        out = F.regexp_replace(
            out, PII_PATTERNS[name], template.format(NAME=name.upper())
        )
    return out


def pseudonymize_pii(
    c: Column | str,
    classes: list[str] | None = None,
    salt: str = "",
    hash_chars: int = 8,
) -> Column:
    """CONSISTENT pseudonymization: each PII span is replaced by
    ``<CLASS_xxxxxxxx>`` where the hex suffix is a salted md5 of the
    span — the same email maps to the same token EVERYWHERE in the
    corpus, so coreference ("user A mailed user A again") and
    exact-dedup equality survive the scrub, unlike blanket
    :func:`redact_pii` tokens which erase the distinction, and
    unlike per-document counters which break cross-document
    equality. ``salt`` keys the mapping: ship a fresh salt per
    release and tokens are unlinkable across releases (and never
    reversible without brute-forcing the value space).

    Plan shape: per class, split on the pattern (non-match
    segments), hash the matches, and interleave — all JVM
    (``split`` / ``regexp_extract_all`` / ``zip_with`` +
    ``aggregate`` join). The higher-order lambdas here run over
    per-document MATCH arrays (a handful of elements), not corpus
    token explosions, so the interpreted-HOF hot-path rule
    (verify-skill r7 note) doesn't bite. NULL stays NULL."""
    if not 4 <= hash_chars <= 32:
        raise ValueError("hash_chars must be in [4, 32]")
    out = F.col(c) if isinstance(c, str) else c
    for name in _classes(classes):
        pat = PII_PATTERNS[name]
        segs = F.split(out, pat, -1)
        toks = F.transform(
            F.regexp_extract_all(out, F.lit(pat), F.lit(0)),
            lambda m: F.concat(
                F.lit(f"<{name.upper()}_"),
                F.substring(F.md5(F.concat(F.lit(salt), m)), 1, hash_chars),
                F.lit(">"),
            ),
        )
        # interleave: seg0 tok0 seg1 tok1 ... segN (tokens padded
        # with one trailing "" so zip_with lengths match)
        padded = F.concat(toks, F.array(F.lit("")))
        out = F.array_join(
            F.zip_with(segs, padded, lambda s, t: F.concat(s, t)), ""
        )
    return out


def luhn_valid(c: Column | str) -> Column:
    """True when the digits of ``c`` pass the Luhn checksum (the
    credit-card check digit) — an expression-level fold, no UDF:
    strip non-digits, double every second digit from the right
    (9-wrapping), sum mod 10. Use to drop false-positive
    ``credit_card`` matches before redaction metrics:
    13–19 digit strings that aren't Luhn-valid are usually IDs.
    NULL/blank → false."""
    s = F.col(c) if isinstance(c, str) else c
    digits = F.regexp_replace(s.cast("string"), r"[^0-9]", "")
    n = F.length(digits)
    # arr[i] = digit at position i (0-based from the LEFT); weight
    # doubles when (n - 1 - i) is odd, i.e. every 2nd from the right
    arr = F.transform(
        F.split(digits, ""),
        lambda d, i: F.when(
            d == "", F.lit(0)
        ).otherwise(
            F.when(
                ((n - 1 - i) % 2) == 1,
                # doubled with 9-wrap: 2d - 9 if 2d > 9 else 2d
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(
                    d.cast("int") * 2
                ),
            ).otherwise(d.cast("int"))
        ),
    )
    total = F.aggregate(arr, F.lit(0), lambda acc, v: acc + v)
    return (n >= F.lit(13)) & (n <= F.lit(19)) & ((total % 10) == 0)


def pii_filter(
    df: DataFrame, text_col: str, max_total: int = 0,
    classes: list[str] | None = None,
) -> DataFrame:
    """Keep rows whose total PII match count is at most
    ``max_total`` (default 0 = drop anything that matches). Counts
    never leave the row — no shuffle."""
    names = _classes(classes)
    total = None
    for name in names:
        c = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
            F.size(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(PII_PATTERNS[name]), F.lit(0)
                )
            )
        )
        total = c if total is None else total + c
    return df.filter(total <= F.lit(int(max_total)))
