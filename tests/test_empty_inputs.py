"""Empty-input totality: core operators must return empty results (not
throw) when their input relation is empty — the behaviour a 100 TB DAG
needs when one partition-pruned branch comes back with zero rows."""

from __future__ import annotations

import pyspark.sql.functions as F


def _empty_like(spark, schema: str):
    return spark.createDataFrame([], schema)


def test_dedup_family_on_empty_corpus(spark):
    from synth_transform_spark.operators import dedup

    docs = _empty_like(spark, "doc_id long, text string")
    assert dedup.minhash_near_duplicates(docs, threshold=0.8).count() == 0
    assert dedup.exact_groups(docs).count() == 0


def test_similarity_on_empty_queries(spark):
    from synth_transform_spark.operators import similarity
    from synth_transform_spark.sources.readers import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    none = emb.filter("vec_id < 0")
    assert similarity.cosine_topk(emb, none, k=3).count() == 0
    assert similarity.pq_topk(emb, none, k=3).count() == 0


def test_temporal_and_graph_on_empty(spark):
    from synth_transform_spark.operators.graph import ancestor_closure, kcore
    from synth_transform_spark.operators.temporal import interval_overlap_join

    e = _empty_like(spark, "node long, parent long")
    assert ancestor_closure(e, n_rounds=3).count() == 0
    edges = _empty_like(spark, "s long, d long")
    assert kcore(edges, k=2, n_rounds=2).count() == 0
    ivals = _empty_like(spark, "l_start long, l_end long")
    rvals = _empty_like(spark, "r_start long, r_end long")
    assert interval_overlap_join(ivals, rvals).count() == 0


def test_sketches_on_empty(spark):
    from synth_transform_spark.operators import sketches

    df = _empty_like(spark, "g string, v string")
    assert sketches.hll_distinct(df, ["g"], "v").count() == 0
    assert sketches.kmv_set_estimates(df, "g", "v", k=8).count() == 0


def test_round5_operators_on_empty(spark):
    from synth_transform_spark.operators.ml import deterministic_pca_project
    from synth_transform_spark.operators.similarity import (
        kcenter_coreset,
        semdedup_drops,
    )

    emb = _empty_like(spark, "vec_id long, embedding array<float>")
    assert deterministic_pca_project(emb, k=2, dim=64).count() == 0
    assert kcenter_coreset(emb, k=8).count() == 0
    clusters = _empty_like(spark, "vec_id long, cluster int")
    assert semdedup_drops(emb, clusters, threshold=0.35).count() == 0


def test_kcenter_smaller_corpus_than_k(spark):
    """k-center must cap at the corpus size, never re-select a point."""
    from synth_transform_spark.operators.similarity import kcenter_coreset
    from synth_transform_spark.sources.readers import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").filter("vec_id < 3")
    out = kcenter_coreset(emb, k=8).toPandas()
    assert len(out) == 3
    assert sorted(out.vec_id.tolist()) == [0, 1, 2]
    assert out.sel_rank.tolist() == sorted(out.sel_rank.tolist())
