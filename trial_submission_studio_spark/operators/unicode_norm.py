"""Unicode normalization + confusable (homoglyph) skeletons —
spoof-resistant text canonicalization for dedup and quality.

Web-spam and SEO text routinely evades exact/near dedup by swapping
Latin letters for visually identical Cyrillic/Greek codepoints
(``а`` U+0430 for ``a``), injecting zero-width characters, or using
fullwidth/compatibility forms. `dedup.normalize_text` (lowercase +
whitespace collapse) is blind to all three. This module adds the
canonical-form ladder the Unicode reports prescribe:

- :func:`normalize_unicode` — NFC/NFKC/NFD/NFKD via ``unicodedata``
  (Arrow-batched pandas UDF; NFKC folds fullwidth forms, ligatures
  ``ﬁ``→``fi``, circled digits, superscripts);
- :func:`strip_default_ignorable` — removes zero-width space/
  joiner/non-joiner, soft hyphen, BOM, word joiner, directional
  marks (the invisible-injection vector) — pure codegen
  ``translate``, no Python;
- :func:`confusable_skeleton` — UTS #39-style skeleton: NFKC, strip
  ignorables, then map a curated table of common confusables
  (Cyrillic/Greek homoglyphs of Latin letters, fullwidth already
  folded by NFKC) to their Latin targets, lowercase, collapse
  whitespace. The full Unicode ``confusables.txt`` is not in this
  container; the shipped table is the hand-curated high-frequency
  subset (the letters that HAVE cross-script lookalikes), marked so
  a data file can replace it;
- :func:`skeleton_fingerprint` — md5 of the skeleton: the
  spoof-resistant twin of `dedup.fingerprint`, drop-in as an
  `exact_duplicates`-style key.

Scale shape: `strip_default_ignorable` and the confusable mapping
are single ``translate`` expressions (whole-stage codegen, zero
Python); only the NFKC step needs Python (`unicodedata` — a
JVM-side ICU transform would replace it on a real cluster), and it
is Arrow-batched. Fingerprints shuffle as 16-byte keys like every
other dedup key — text never moves.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no Unicode-security
surface; this extends the dedup family (SURVEY.md §2.13) where
adversarial evasion meets `dedup.fingerprint`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_unicode",
    "strip_default_ignorable",
    "confusable_skeleton",
    "skeleton_fingerprint",
    "CONFUSABLE_MAP",
    "DEFAULT_IGNORABLE",
]

#: default-ignorable / invisible codepoints commonly injected to
#: break exact matching (soft hyphen, zero-widths, BOM, bidi marks)
DEFAULT_IGNORABLE = (
    "­"  # soft hyphen
    "​"  # zero width space
    "‌"  # zero width non-joiner
    "‍"  # zero width joiner
    "‎"  # left-to-right mark
    "‏"  # right-to-left mark
    "⁠"  # word joiner
    "﻿"  # BOM / zero width no-break space
)

#: curated UTS #39-flavored confusable map: cross-script homoglyphs
#: of Latin letters that survive NFKC (NFKC already folds fullwidth/
#: compatibility forms). Keys are the spoofing codepoints, values the
#: Latin skeleton target. Hand-curated high-frequency subset of the
#: public confusables data (the full confusables.txt is not in this
#: container); extend by appending — the translate expression is
#: rebuilt from this dict.
CONFUSABLE_MAP = {
    # Cyrillic lowercase lookalikes
    "а": "a",  # а
    "е": "e",  # е
    "о": "o",  # о
    "р": "p",  # р
    "с": "c",  # с
    "у": "y",  # у
    "х": "x",  # х
    "і": "i",  # і (Ukrainian)
    "ј": "j",  # ј
    "һ": "h",  # һ
    "ѕ": "s",  # ѕ
    "ԁ": "d",  # ԁ
    "ԛ": "q",  # ԛ
    "ԝ": "w",  # ԝ
    # Cyrillic uppercase lookalikes
    "А": "A", "В": "B", "С": "C", "Е": "E",
    "Н": "H", "К": "K", "М": "M", "О": "O",
    "Р": "P", "Т": "T", "Х": "X", "І": "I",
    "Ј": "J", "Ѕ": "S",
    # Greek lookalikes
    "ο": "o",  # ο omicron
    "α": "a",  # α (skeleton convention)
    "ν": "v",  # ν
    "Α": "A", "Β": "B", "Ε": "E", "Ζ": "Z",
    "Η": "H", "Ι": "I", "Κ": "K", "Μ": "M",
    "Ν": "N", "Ο": "O", "Ρ": "P", "Τ": "T",
    "Υ": "Y", "Χ": "X",
    # common punctuation/digit spoofs
    "‐": "-", "‑": "-", "‒": "-", "–": "-",
    "—": "-", "−": "-",
    "‘": "'", "’": "'", "“": '"', "”": '"',
    " ": " ",  # no-break space
    "⁄": "/",
}


def normalize_unicode(col: Column | str, form: str = "NFKC") -> Column:
    """``unicodedata.normalize(form, s)`` as an Arrow-batched pandas
    UDF (NULL-safe). The only Python step in the ladder — swap for a
    JVM ICU transform at cluster scale, same contract."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    the_form = form

    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(the_form, x)
            if x is not None
            else None
        )

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c.cast("string"))


def strip_default_ignorable(col: Column | str) -> Column:
    """Remove invisible default-ignorable codepoints — pure codegen
    (``translate`` with empty replacements), no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c.cast("string"), DEFAULT_IGNORABLE, "")


def _apply_confusables(c: Column) -> Column:
    src = "".join(CONFUSABLE_MAP.keys())
    dst = "".join(CONFUSABLE_MAP.values())
    return F.translate(c, src, dst)


def confusable_skeleton(col: Column | str, form: str = "NFKC") -> Column:
    """UTS #39-style skeleton: NFKC → strip invisibles → confusable
    fold → lowercase → whitespace collapse + trim. Two texts that
    LOOK the same skeleton to the same string, so
    ``skeleton(a) = skeleton(b)`` is the spoof-resistant equality."""
    c = F.col(col) if isinstance(col, str) else col
    normd = normalize_unicode(c, form=form)
    return F.trim(
        F.regexp_replace(
            F.lower(_apply_confusables(strip_default_ignorable(normd))),
            "\\s+",
            " ",
        )
    )


def skeleton_fingerprint(col: Column | str) -> Column:
    """md5 of the confusable skeleton — the spoof-resistant twin of
    `dedup.fingerprint`; use as the key of `dedup.exact_duplicates`
    / `crosssource.source_overlap_matrix` when the corpus may
    contain adversarial homoglyph rewrites."""
    return F.md5(confusable_skeleton(col))


def add_skeleton_fingerprint(
    df: DataFrame, text_col: str, out_col: str = "skeleton_fp"
) -> DataFrame:
    """Column-append convenience for pipeline composition."""
    return df.withColumn(out_col, skeleton_fingerprint(text_col))


#: scripts with a Java \p{Is<name>} class AND an RE2 \p{<name>} class
#: (so the same counts mirror to DuckDB/Go engines verbatim)
DEFAULT_SCRIPTS = (
    "Latin", "Cyrillic", "Greek", "Arabic", "Hebrew", "Han",
    "Hiragana", "Katakana", "Hangul", "Devanagari", "Thai",
)


def script_count(c: Column | str, script: str) -> Column:
    """Codepoints of ``script`` in the text (Java regex script class,
    whole-stage codegen)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(col, F.lit(f"\\p{{Is{script}}}")).cast("long")


def dominant_script(
    c: Column | str,
    scripts: tuple[str, ...] = DEFAULT_SCRIPTS,
    min_fraction: float = 0.5,
) -> Column:
    """The script owning at least ``min_fraction`` of the text's
    LETTERS — the routing signal in front of language-ID (script
    narrows the candidate languages and catches mixed-script spam
    that n-gram langid mis-buckets). Returns the script name,
    ``'mixed'`` when no script reaches the fraction, ``'none'`` for
    letterless text. Ties at the max resolve to the alphabetically
    LAST script name (struct max compares count then name —
    deterministic everywhere).

    All codegen: one regexp_count per script + an array_max over
    (count, name) structs; no Python, no shuffle."""
    col = F.col(c) if isinstance(c, str) else c
    # NULL text counts as letterless -> 'none' (not a spurious 'mixed')
    letters = F.coalesce(
        F.regexp_count(col, F.lit(r"\p{L}")).cast("long"), F.lit(0)
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    script_count(col, s).alias("n"), F.lit(s).alias("s")
                )
                for s in scripts
            ]
        )
    )
    return (
        F.when(letters == 0, F.lit("none"))
        .when(
            best["n"].cast("double")
            >= F.lit(float(min_fraction)) * letters.cast("double"),
            best["s"],
        )
        .otherwise(F.lit("mixed"))
    )
