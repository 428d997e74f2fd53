"""Pure-Python invariants of the linear-permutation MinHash scheme.

These guard the 64-bit safety contract that makes q27 portable: every
permutation ``a*x + b`` must stay under 2^63 - 1 for any 32-bit shingle
hash, in both Spark (ANSI mode would raise on overflow) and DuckDB
(checked bigint arithmetic errors on overflow). No SparkSession needed.
"""

from __future__ import annotations

from synth_transform_spark.operators import dedup

I63_MAX = (1 << 63) - 1
X_MAX = (1 << 32) - 1  # conv(substr(md5,1,8),16,10) upper bound


def test_perm_constants_never_overflow_signed_64():
    for a, b in dedup._perm_constants(dedup.N_PERMS):
        assert 0 < a < 1 << 31 and 0 <= b < 1 << 31
        assert a * X_MAX + b <= I63_MAX


def test_perm_constants_are_deterministic_and_distinct():
    c1 = dedup._perm_constants(dedup.N_PERMS)
    assert c1 == dedup._perm_constants(dedup.N_PERMS)
    assert len(set(c1)) == dedup.N_PERMS  # distinct permutations
    assert all(a % 2 == 1 for a, _ in c1)  # odd ⇒ a % MINHASH_PRIME != 0


def test_minhash_prime_exceeds_hash_domain():
    # P > 2^32 so (a*x + b) % P is a proper permutation-family range over
    # the full 32-bit shingle-hash domain.
    assert dedup.MINHASH_PRIME > X_MAX


def test_simhash_band_collision_is_lossless_at_default_distance(spark):
    """Pigeonhole property: with 4 bands of 15 bits, every pair within
    hamming <= 3 must be recovered by the banded path — compare against the
    exhaustive all-pairs answer on the fixture corpus."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR
    from synth_transform_spark.operators import dedup
    from synth_transform_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    banded = dedup.simhash_near_duplicates(docs, max_hamming=3).toPandas()
    sigs = dedup.simhash_signatures(docs)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"))
    exhaustive = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"))
        .filter(F.col("hamming") <= 3)
        .toPandas()
    )
    assert len(exhaustive) > 0, "fixture corpus must contain hamming<=3 pairs"
    assert set(zip(banded.id_a, banded.id_b)) == set(zip(exhaustive.id_a, exhaustive.id_b))


def test_prefix_filter_prunes_but_loses_nothing(spark):
    """Prefix-filter join (q182): candidates are a strict subset of the
    shared-shingle pair space, yet the verified result equals the
    brute-force all-pairs Jaccard answer on the fixture corpus."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR
    from synth_transform_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_jaccard_join(docs, threshold=0.5).collect()
    }
    # brute force: every shared-shingle pair, exact verify
    sh = dedup.shingles(docs)
    all_pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    doc_sh = dedup.shingle_arrays(docs)
    exp = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_verify_arrays(
            all_pairs, doc_sh, threshold=0.5
        ).collect()
    }
    assert got == exp and len(got) > 0
    # and the result is far smaller than the shared-shingle pair space the
    # brute-force path had to verify
    assert len(got) < all_pairs.count()


def test_prefix_filter_exact_at_awkward_threshold(spark):
    """threshold=0.55: float ceil(0.55*sz) over-rounds for many sz (e.g.
    sz=100 → 56 not 55), which would shorten prefixes and drop qualifying
    pairs. The rational-arithmetic prefix must still equal brute force."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR
    from synth_transform_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_jaccard_join(docs, threshold=0.55).collect()
    }
    sh = dedup.shingles(docs)
    all_pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    exp = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_verify_arrays(
            all_pairs, dedup.shingle_arrays(docs), threshold=0.55
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_lsh_probe_shared_ids_no_self_pairs(spark):
    """A doc id present in BOTH base and delta (re-ingestion) must not
    self-match, and each side's text resolves against its own shingles."""
    texts = {
        1: "a b c d e f g h i j",
        2: "a b c d e f g h i x",   # near-dup of 1
        3: "z y x w v u t s r q",
    }
    base = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    # delta re-ingests id 1 with DIFFERENT text (now a near-dup of doc 3's
    # content) plus a fresh id 4 duplicating doc 2
    delta = spark.createDataFrame(
        [(1, "z y x w v u t s r p"), (4, texts[2])], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.lsh_probe(base, delta, threshold=0.5, n=2).collect()
    }
    assert all(a != b for a, b in pairs)
    # delta id 4 matches base doc 2 exactly (jaccard 1.0)
    assert pairs.get((2, 4)) == 1.0
    # re-ingested id 1 matches base doc 3 via its NEW text — proving the
    # delta side resolved against delta shingles, not the stale base text
    assert (3, 1) in pairs


def test_bucket_expansion_single_shuffle_with_spillable_guard(spark):
    """Round-11 plan pin: the candidate stage is ONE bucket-keyed shuffle —
    a (spillable) Window count guard whose hash partitioning is REUSED by
    the collect_list aggregation (no exchange between them), plus the
    trailing distinct's exchange. A third exchange or a missing Window
    means the guard shape regressed (collect-before-filter risks a
    degenerate-bucket OOM; a semi-join shape doubles the band shuffle)."""
    import re

    bands = spark.createDataFrame(
        [(i, i % 3, f"k{i % 5}") for i in range(40)],
        "doc_id long, band_id int, band_key string",
    )
    plan = (
        dedup.lsh_candidate_pairs(bands, max_bucket=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert "Window" in plan, plan
    assert n_exchanges == 2, f"expected bucket+distinct shuffles only:\n{plan}"
    # and the guard really binds: a bucket of 11 docs sharing a band must
    # contribute no pairs at max_bucket=10
    big = spark.createDataFrame(
        [(i, 0, "hot") for i in range(11)] + [(100, 0, "ok"), (101, 0, "ok")],
        "doc_id long, band_id int, band_key string",
    )
    pairs = dedup.lsh_candidate_pairs(big, max_bucket=10).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(100, 101)}
