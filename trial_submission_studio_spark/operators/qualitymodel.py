"""Trainable document-quality classifier (the "looks like reference
text" stage of CCNet/GPT-3/LLaMA-style corpus pipelines).

The heuristic gates in :mod:`.textstats` / :mod:`.qualityfilter` are
fixed rules; production pipelines follow them with a LEARNED filter —
a linear classifier over hashed bag-of-n-gram features (the fastText
recipe used by CCNet) scoring P(document is reference-like). This
module implements that stage Spark-first:

- Featurization is lowercased word unigrams + adjacent bigrams hashed
  into a fixed-width sparse vector — built-in expressions plus
  ``pyspark.ml.feature.HashingTF``, all JVM-side; no Python in the
  row path at either train or score time.
- Training is ``pyspark.ml.classification.LogisticRegression``
  (distributed L-BFGS via treeAggregate — a handful of full passes
  over the training frame, each map-side combined).
- Labels come either from the caller (reference corpus = 1 vs raw
  crawl = 0, the GPT-3 setup) or from
  :func:`weak_quality_labels` — bootstrapped weak supervision using
  the engine's own heuristic gates with an abstain band, the standard
  trick when no labeled corpus exists.
- Scoring is ``model.transform`` + ``vector_to_array`` — JVM-side,
  embarrassingly parallel, no shuffle.

Scale shape: train touches the (usually sampled) labeled frame a few
times; score is a stateless per-row map over the full corpus with the
model's single dense coefficient vector (num_features doubles, ~0.5 MB
at 2^16) shipped in the plan — nothing here degrades at 100 TB.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no ML stage; this belongs
to the LLM-training-data extension surface like `operators/lm.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.textstats import (
    dup_line_fraction_e4,
    quality_score,
    stopword_ratio,
    tokens,
)


def quality_ngram_tokens(c: Column | str, bigrams: bool = True) -> Column:
    """Lowercased word unigrams (+ ``a_b`` adjacent bigrams) as one
    array<string> — the hashed-feature vocabulary. Pure array
    expressions; the per-row transform lambdas are fine here because
    featurization runs once per scored document, not inside an
    exploded hot loop."""
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    if not bigrams:
        return toks
    bg = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bg)


def weak_quality_labels(
    df: DataFrame,
    id_col: str,
    text_col: str,
    good_threshold: float = 0.7,
    bad_threshold: float = 0.35,
) -> DataFrame:
    """Weak-supervision labels from the heuristic gates: confident
    good (high composite quality, low repetition, some stopword mass)
    → 1.0; confident bad → 0.0; the ambiguous middle ABSTAINS (rows
    dropped) so the classifier never trains on heuristic noise.

    Returns (id_col, label double). Zero-shuffle — every signal is a
    per-row expression.
    """
    q = quality_score(text_col)
    dup = dup_line_fraction_e4(text_col)
    sw = stopword_ratio(text_col)
    good = (q >= F.lit(float(good_threshold))) & (dup <= 1000) & (sw >= 0.03)
    bad = (q <= F.lit(float(bad_threshold))) | (dup >= 3000)
    return (
        df.select(
            F.col(id_col),
            F.when(good & ~bad, F.lit(1.0))
            .when(bad, F.lit(0.0))
            .otherwise(F.lit(None).cast("double"))
            .alias("label"),
        )
        .filter(F.col("label").isNotNull())
    )


@dataclass
class QualityModel:
    """Fitted classifier + the featurization parameters that scoring
    must replay identically. ``lr_model`` is a pyspark.ml
    LogisticRegressionModel (persist via its own ``save``/``load``;
    num_features/bigrams are plain ints to store alongside)."""

    num_features: int
    bigrams: bool
    lr_model: object  # pyspark.ml.classification.LogisticRegressionModel


def _featurize(df: DataFrame, text_col: str, num_features: int, bigrams: bool) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    with_toks = df.withColumn(
        "__q_toks", quality_ngram_tokens(text_col, bigrams=bigrams)
    )
    tf = HashingTF(
        inputCol="__q_toks", outputCol="__q_features", numFeatures=int(num_features)
    )
    return tf.transform(with_toks).drop("__q_toks")


def train_quality_model(
    labeled: DataFrame,
    text_col: str,
    label_col: str = "label",
    num_features: int = 1 << 16,
    bigrams: bool = True,
    max_iter: int = 50,
    reg_param: float = 1e-3,
) -> QualityModel:
    """Fit the hashed-n-gram logistic regression on (text, label∈{0,1})
    rows — pass an explicit reference-vs-crawl frame or the output of
    :func:`weak_quality_labels` joined back to the text."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.storagelevel import StorageLevel

    # persist the featurized frame: every L-BFGS iteration is a full
    # pass, and without this each pass re-runs tokenization + hashing
    # (measured ~0.5 s/iteration of pure recompute even at bench scale)
    feats = _featurize(labeled, text_col, num_features, bigrams).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        lr = LogisticRegression(
            featuresCol="__q_features",
            labelCol=label_col,
            maxIter=int(max_iter),
            regParam=float(reg_param),
            standardization=False,
        )
        model = lr.fit(feats)
    finally:
        feats.unpersist()
    return QualityModel(num_features=int(num_features), bigrams=bool(bigrams), lr_model=model)


def score_quality_model(
    df: DataFrame,
    model: QualityModel,
    text_col: str,
    output_col: str = "quality_prob",
) -> DataFrame:
    """Append P(reference-like) ∈ [0,1] for every row. JVM-side
    end-to-end: featurize → LR transform → probability[1]."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(df, text_col, model.num_features, model.bigrams)
    scored = model.lr_model.transform(feats)
    return scored.withColumn(
        output_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("__q_features", "rawPrediction", "probability", "prediction")


def quality_model_filter(
    df: DataFrame,
    model: QualityModel,
    text_col: str,
    min_prob: float = 0.5,
) -> DataFrame:
    """Keep rows scoring at least ``min_prob`` (the learned analog of
    :func:`.qualityfilter.line_quality_filter`'s document gate)."""
    scored = score_quality_model(df, model, text_col)
    return scored.filter(F.col("quality_prob") >= F.lit(float(min_prob))).drop(
        "quality_prob"
    )
