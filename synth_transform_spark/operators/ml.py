"""Text-classification pipeline on Spark ML (notebook-analytics parity).

Reference lineage: /root/reference/notebooks/classifiers.ipynb cells 12-18
(TfidfVectorizer + LinearSVC over output titles) and outliers.ipynb cells
3-5 (same vectoriser + SVC probability → z-score outliers). Re-expressed
Spark-first:

- tokenisation = the reference's lowercase/strip-non-alpha regex (cell 12)
  as Catalyst expressions (no spaCy dependency — POS filtering is gated
  out; SURVEY.md §2.8 F16 documents the approximation);
- TF-IDF = HashingTF + IDF (distributed, no vocabulary broadcast at 100 TB;
  CountVectorizer is the exact-parity alternative when the vocab fits);
- classifier = multinomial LogisticRegression (multi-class; the notebook's
  LinearSVC is binary-per-class — OneVsRest(LinearSVC) is the drop-in when
  exact parity matters).

Training is iterative (not SQL-expressible) → the registry entry has no
oracle; the driver records the weaker rows-only check (allowed for
iterative algorithms), and tests assert determinism + accuracy floors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOKEN_PATTERN = "[^a-z ]"


def tokens_col(text_col: str):
    """Reference tokeniser (classifiers.ipynb cell 12): lowercase, strip
    non-letters, split, drop empties/len-1 tokens."""
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), TOKEN_PATTERN, " ")
    return F.filter(F.split(cleaned, " +"), lambda t: F.length(t) > 1)


def build_pipeline(n_features: int = 1 << 12, max_iter: int = 25, reg: float = 0.01):
    """HashingTF → IDF → multinomial LogisticRegression pipeline (unfitted)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, StringIndexer

    return Pipeline(
        stages=[
            StringIndexer(inputCol="label_str", outputCol="label", handleInvalid="keep"),
            HashingTF(inputCol="tokens", outputCol="tf", numFeatures=n_features),
            IDF(inputCol="tf", outputCol="features"),
            LogisticRegression(maxIter=max_iter, regParam=reg, family="multinomial"),
        ]
    )


def prepare(docs: DataFrame, text_col: str = "text", label_col: str = "lang") -> DataFrame:
    return docs.select(
        "doc_id",
        F.col(label_col).alias("label_str"),
        tokens_col(text_col).alias("tokens"),
    )


def train_and_score(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    holdout_mod: int = 5,
) -> DataFrame:
    """Train on ~80% (doc_id % holdout_mod != 0), score the holdout.

    Deterministic split via the id, not RNG, so results are stable across
    partitionings and engines. Returns a confusion rollup
    (label_str, predicted_str, n) over the holdout.
    """
    prepped = prepare(docs, text_col, label_col)
    train = prepped.filter(F.col("doc_id") % holdout_mod != 0)
    test = prepped.filter(F.col("doc_id") % holdout_mod == 0)
    model = build_pipeline().fit(train)
    labels = model.stages[0].labelsArray[0]
    idx_to_label = F.array(*[F.lit(l) for l in labels])
    scored = model.transform(test).withColumn(
        "predicted_str",
        F.when(
            F.col("prediction").cast("int") < len(labels),
            F.element_at(idx_to_label, F.col("prediction").cast("int") + 1),
        ).otherwise(F.lit("__unknown__")),
    )
    return (
        scored.groupBy("label_str", "predicted_str")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pca_project(
    vectors: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project array<float> embeddings onto their top-k principal components
    (classifiers.ipynb cells 16-18 use PCA the same way, for 2-D structure
    inspection of the TF-IDF space).

    Spark ML PCA computes the covariance eigenbasis distributed (one pass +
    a k x d driver-side SVD — d is the embedding width, not the row count,
    so this holds at 100 TB). Output: (id, pc array<double> of length k).
    Component SIGN is basis-dependent — consumers should compare absolute
    loadings or fix signs downstream (documented, matches sklearn caveat).
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = vectors.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("v")
    )
    model = PCA(k=k, inputCol="v", outputCol="pc_vec").fit(vecs)
    return model.transform(vecs).select(
        F.col(id_col), vector_to_array(F.col("pc_vec")).alias("pc")
    )
