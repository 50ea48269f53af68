"""Text analysis operators (north-star extension): token counting,
language-ID heuristic, quality scoring — all expression-only
(whole-stage codegen; zero Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: minimal English stopword set for the n-gram/stopword-ratio
#: language heuristic (public-domain word list)
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "it", "that", "this", "with", "for", "on", "as",
    "at", "by", "be", "from", "not", "but", "they", "he", "she",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the trimmed text (array<string>); empty
    text → empty array."""
    s = F.trim(_col(c).cast("string"))
    return F.when(s.isNull() | (s == ""), F.array().cast("array<string>")).otherwise(
        F.split(s, "\\s+")
    )


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c: Column | str) -> Column:
    """A BPE-flavored proxy: word pieces + digits + punctuation runs.

    Counts matches of (letter-runs | digit-runs | single punct),
    which tracks subword tokenizer counts far better than whitespace
    on code/punctuation-heavy text.
    """
    s = F.trim(_col(c).cast("string"))
    arr = F.regexp_extract_all(s, F.lit("([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])"), 1)
    return F.size(arr).cast("long")


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """fraction of tokens that are (lowercased) stopwords; 0 for empty."""
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def predict_english(c: Column | str, threshold: float = 0.12) -> Column:
    """Heuristic language ID: stopword ratio ≥ threshold → English."""
    return (stopword_ratio(c) >= F.lit(threshold)).alias("is_en")


def punct_ratio(c: Column | str) -> Column:
    s = F.trim(_col(c).cast("string"))
    total = F.length(s)
    punct = F.length(F.regexp_replace(s, "[A-Za-z0-9\\s]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(c: Column | str) -> Column:
    """Composite [0,1] quality proxy: long enough, low punctuation,
    reasonable mean word length (the reference engine has no analog;
    this mirrors common LLM-corpus quality filters)."""
    s = F.trim(_col(c).cast("string"))
    n_tok = token_count(c)
    len_score = F.least(F.length(s).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4)
    mean_word = F.when(n_tok > 0, F.length(s).cast("double") / n_tok).otherwise(F.lit(0.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * punct_penalty * word_score, 4)
