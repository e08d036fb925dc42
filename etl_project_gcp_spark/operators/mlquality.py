"""Model-based document quality scoring (X4 family).

Modern pre-training pipelines follow heuristic filters with a learned
quality classifier (CCNet / LLaMA-style: a linear fastText model
trained on a curated positive set, scored over the whole corpus). This
module is the Spark-native expression of that stage:

- ``quality_features`` — ONE column-expression pass over the corpus
  producing the continuous per-doc signal vector plus a weak label
  (the strict heuristic gate). No Python, no shuffle.
- ``fit_quality_classifier`` — MLlib ``LogisticRegression`` (JVM
  distributed L-BFGS) on a deterministic hash-split of the weak-labeled
  data; returns the fitted model and held-out AUC.
- ``score_quality`` — ``model.transform``: the fitted coefficients are
  broadcast and applied as a JVM column expression; scoring the full
  corpus is one map-only pass.

The weak label is a boolean function of threshold rules over a SUPERSET
of the features the model sees, so the classifier has real signal to
learn but nothing leaks the label directly; held-out AUC ≥ 0.9 is
asserted in tests/test_mlquality.py.

Scale: training data is the weak-labeled sample (bounded by the caller
— at 100 TB you fit on a hash-sampled slice, not the corpus); scoring
is embarrassingly parallel with zero state beyond the broadcast
coefficients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_project_gcp_spark import exact as X
from etl_project_gcp_spark.operators.text import LANG_MARKERS, tokens

FEATURE_COLS = [
    "n_chars",
    "n_tokens",
    "punct_ratio",
    "stopword_hit_ratio",
    "frac_distinct",
    "mean_token_len",
    # Squared term: the quality gate is two-sided in mean token length
    # (too-short AND too-long both fail), which no linear cut on the
    # raw feature can express; the quadratic makes the band learnable.
    "mean_token_len_sq",
]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Continuous quality signals + weak label, one pass, no Python.

    ``weak_label`` is the strict heuristic gate (length + lexical
    diversity + stopword evidence) — the conventions the heuristic
    filters in ``text.quality_score`` / ``text.gopher_quality`` encode,
    combined so a learned model can replace the rule stack with a
    calibrated probability."""
    text = F.col(text_col)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    n_alpha = F.length(F.regexp_replace(text, r"\s", ""))
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop))
    stop_ratio = X.ddiv_round(n_stop, n_tokens, 4)
    frac_distinct = X.ddiv_round(n_distinct, n_tokens, 4)
    mean_len = X.ddiv_round(n_alpha, n_tokens, 2)
    return docs.select(
        id_col,
        n_chars.cast("double").alias("n_chars"),
        n_tokens.cast("double").alias("n_tokens"),
        X.ddiv_round(n_punct, n_chars, 4).alias("punct_ratio"),
        stop_ratio.alias("stopword_hit_ratio"),
        frac_distinct.alias("frac_distinct"),
        mean_len.alias("mean_token_len"),
        (mean_len * mean_len).alias("mean_token_len_sq"),
        (
            (n_chars >= 50)
            & (n_tokens >= 10)
            & (frac_distinct > 0.3)
            & (mean_len >= 3)
            & (mean_len <= 10)
            & (stop_ratio > 0.0)
        )
        .cast("double")
        .alias("weak_label"),
    )


def fit_quality_classifier(
    feats: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "weak_label",
    holdout_mod: int = 5,
    model_type: str = "gbt",
    seed: int = 7,
):
    """Fit a quality classifier on a deterministic hash-split.

    Rows with ``xxhash64(id) % holdout_mod == 0`` are held out; the
    rest train. Returns ``(model, holdout_auc)``. The split is
    content-keyed (stable across retries/partitionings, same policy as
    the engine's sampling/salting helpers).

    ``model_type``: ``"gbt"`` (default) fits gradient-boosted trees —
    the weak gate is a CONJUNCTION of threshold cuts (a box in feature
    space) which trees express exactly, where any linear scorer lets
    strong evidence on four thresholds outvote failing the fifth
    (measured: LR ≈ 0.84 AUC on sf0.01 vs GBT ≈ 0.99+). ``"lr"`` keeps
    the logistic option for calibrated monotone scores."""
    from pyspark.ml.classification import GBTClassifier, LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features"
    )
    vec = assembler.transform(feats)
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(holdout_mod))
    train = vec.filter(bucket != 0)
    hold = vec.filter(bucket == 0)
    if model_type == "gbt":
        est = GBTClassifier(
            featuresCol="features", labelCol=label_col,
            maxIter=30, maxDepth=4, seed=seed,
        )
    elif model_type == "lr":
        est = LogisticRegression(
            featuresCol="features", labelCol=label_col,
            maxIter=50, regParam=0.01, standardization=True,
        )
    else:
        raise ValueError(f"model_type must be 'gbt' or 'lr', got {model_type!r}")
    model = est.fit(train)
    auc = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol="rawPrediction"
    ).evaluate(model.transform(hold))
    return model, auc


def score_quality(
    feats: DataFrame, model, id_col: str = "doc_id"
) -> DataFrame:
    """Score every doc: ``(id, quality_prob)`` — P(high quality) from
    the fitted model. One map-only pass (coefficients broadcast inside
    the JVM transform); round to 6 dp so downstream comparisons are
    noise-stable."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    vec = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features"
    ).transform(feats)
    return model.transform(vec).select(
        id_col,
        F.round(
            vector_to_array(F.col("probability")).getItem(1), 6
        ).alias("quality_prob"),
    )
