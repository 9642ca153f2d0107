"""Property-based tests (hypothesis) for the numeric kernels that
everything vector/dedup-shaped leans on. Spark round-trips are batched
(one job per property, all examples in one DataFrame) so the suite
stays fast; the pure-numpy kernel properties run without Spark."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

finite_floats = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)


def _vec(dim):
    return st.lists(finite_floats, min_size=dim, max_size=dim)


# ---------------------------------------------------------- pure numpy


@given(st.lists(st.integers(min_value=0, max_value=(1 << 31) - 2), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_minhash_universal_hash_never_overflows_int64(hs):
    """(a*h + b) mod Mersenne-31 must stay below 2^62 for every
    intermediate, under the documented a,b < 2^31 bound — the ANSI-mode
    overflow-safety invariant the fused signature kernel relies on."""
    from skills_vectors_spark.operators.dedup import _MERSENNE, _perms

    h = np.asarray(hs, dtype=np.int64) % _MERSENNE
    for a, b in _perms()[:16]:
        prod = np.int64(a) * h + np.int64(b)
        assert prod.max() < (1 << 62)
        assert ((prod % _MERSENNE) >= 0).all()


@given(st.lists(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_xxhash64_premod_lands_in_mersenne_range(hs):
    """The live signature kernel receives raw SIGNED xxhash64 values
    from the JVM and pre-mods them to the Mersenne-31 field; numpy's
    mod with a positive modulus must land every value (including
    int64 min) in [0, 2^31 - 1)."""
    from skills_vectors_spark.operators.dedup import _MERSENNE

    th = np.asarray(hs, dtype=np.int64) % _MERSENNE
    assert (th >= 0).all() and (th < _MERSENNE).all()


@given(st.lists(_vec(8), min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_hyperplane_bucket_bits_in_range(vecs):
    from skills_vectors_spark.operators.ann import N_PLANES, _plane_matrix

    V = np.array(vecs, dtype=np.float64)
    planes = _plane_matrix(V.shape[1])
    bits = (V @ planes.T) > 0
    from skills_vectors_spark.operators.ann import N_TABLES

    weights = (1 << np.arange(N_PLANES)).astype(np.int64)
    buckets = (bits.reshape(len(V), N_TABLES, N_PLANES) * weights).sum(axis=2)
    assert buckets.min() >= 0 and buckets.max() < (1 << N_PLANES)


# ------------------------------------------------ Spark column macros


def test_cosine_and_l2_match_numpy_batch(spark):
    """One batched Spark job comparing the HOF fold macros against
    numpy over a deterministic spread of vector pairs (magnitudes from
    1e-3 to 1e3, antiparallel to parallel)."""
    from skills_vectors_spark.functions.vector import cosine_sim, l2_dist

    rng = np.random.default_rng(7)
    pairs = []
    for scale_a in (1e-3, 1.0, 1e3):
        for _ in range(20):
            a = (rng.standard_normal(16) * scale_a).astype(np.float32)
            b = rng.standard_normal(16).astype(np.float32)
            pairs.append((a.tolist(), b.tolist()))
    pairs.append(([1.0] * 16, [1.0] * 16))  # parallel
    pairs.append(([1.0] * 16, [-1.0] * 16))  # antiparallel
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    got = df.select(
        cosine_sim("a", "b").alias("cos"), l2_dist("a", "b").alias("l2")
    ).collect()
    for (a, b), r in zip(pairs, got):
        av = np.asarray(a, dtype=np.float64)
        bv = np.asarray(b, dtype=np.float64)
        want_cos = float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)))
        want_l2 = float(np.linalg.norm(av - bv))
        assert math.isclose(r.cos, want_cos, rel_tol=1e-12, abs_tol=1e-12), (a, b)
        assert math.isclose(r.l2, want_l2, rel_tol=1e-9, abs_tol=1e-9), (a, b)


def test_cosine_zero_vector_is_null_not_a_crash(spark):
    """cosine is undefined for a zero-norm vector: the kernel yields
    NULL (nullif guard) instead of the ANSI DIVIDE_BY_ZERO that would
    kill a whole similarity job over one padding/dead-feature row.
    Cross-engine boundary pinned here: DuckDB's kernel clamps the
    same case to -1.0, so zero-norm rows sit outside oracle parity."""
    from skills_vectors_spark.functions.vector import cosine_sim

    df = spark.createDataFrame(
        [
            ([0.0, 0.0], [1.0, 2.0]),
            ([0.0, 0.0], [0.0, 0.0]),
            ([3.0, 4.0], [3.0, 4.0]),
        ],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine_sim("a", "b").alias("c")).collect()]
    assert got[0] is None
    assert got[1] is None
    assert math.isclose(got[2], 1.0, rel_tol=1e-12)


def test_normalize_text_idempotent_batch(spark):
    from skills_vectors_spark.functions.text import normalize_text

    samples = [
        "  Hello   WORLD  ",
        "a\tb\nc",
        "",
        "  ",
        "MiXeD CaSe  123",
        "x" * 500,
        "tab\t\ttab",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    once = df.select(normalize_text("t").alias("n"))
    twice = once.select(normalize_text("n").alias("n2")).collect()
    one = once.collect()
    assert [r.n for r in one] == [r.n2 for r in twice]
