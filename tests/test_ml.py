"""Spark ML text-classification pipeline tests (plumbing + determinism —
the synthetic word-bag corpus carries no real lang signal, so accuracy is
not asserted; the reference notebook's quality metrics are human-reviewed
there too)."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR
from synth_transform_spark.operators import ml
from synth_transform_spark.sources.readers import load_table


def test_confusion_covers_holdout(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = ml.train_and_score(docs)
    holdout = docs.filter(F.col("doc_id") % 5 == 0)
    assert out.agg(F.sum("n")).first()[0] == holdout.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    got = out.collect()
    assert {r.label_str for r in got} <= langs
    assert {r.predicted_str for r in got} <= langs | {"__unknown__"}


def test_training_is_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(map(tuple, ml.train_and_score(docs).collect()))
    b = sorted(map(tuple, ml.train_and_score(docs).collect()))
    assert a == b


def test_tokeniser_matches_reference_regex(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! a bb-cc 123 x")], ["doc_id", "text"]
    )
    toks = df.select(ml.tokens_col("text").alias("t")).first().t
    # lowercase, non [a-z ] stripped to space, len>1 survivors only
    assert toks == ["hello", "world", "bb", "cc"]


def test_pca_project_preserves_rows_and_orders_variance(spark):
    from synth_transform_spark.operators.ml import pca_project
    from synth_transform_spark.sources.readers import load_table
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings")
    out = pca_project(emb, k=2).toPandas()
    assert len(out) == emb.count()
    assert all(len(p) == 2 for p in out.pc)
    # PC1 must carry at least as much variance as PC2 (eigenvalue ordering)
    mat = np.array(out.pc.tolist())
    assert mat[:, 0].var() >= mat[:, 1].var()
