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
