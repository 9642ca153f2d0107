"""join_cross_topk sorted-neighbor plan: adversarial parity against
an in-test brute force (the exact semantics the DuckDB oracle runs).

The r10 rewrite replaces the |S| x |C| cross-join expansion with
candidate generation (per distinct balance the 3 smallest custkeys;
per supplier the 3 nearest distinct balances each side; exact
re-rank). These tests plant the data shapes where that derivation
could break: mass balance ties, exactly-equidistant value pairs,
suppliers sitting on partition edges, and suppliers at the domain
extremes with fewer than 3 values per side.
"""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def _plant(customers, suppliers):
    """customers: [(custkey, acctbal)], suppliers: [(suppkey, acctbal)]
    -> sf_dir with minimal customer/supplier parquet (engine schema)."""
    d = tempfile.mkdtemp(prefix="svs_xtopk_")
    ck, cb = zip(*customers)
    c = pa.table(
        {
            "c_custkey": pa.array(ck, pa.int64()),
            "c_name": pa.array([f"c{k}" for k in ck]),
            "c_nationkey": pa.array([0] * len(ck), pa.int32()),
            "c_acctbal": pa.array(cb, pa.float64()),
            "c_mktsegment": pa.array(["BUILDING"] * len(ck)),
        }
    )
    sk, sb = zip(*suppliers)
    s = pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array([f"s{k}" for k in sk]),
            "s_nationkey": pa.array([0] * len(sk), pa.int32()),
            "s_acctbal": pa.array(sb, pa.float64()),
        }
    )
    pq.write_table(c, os.path.join(d, "customer.parquet"))
    pq.write_table(s, os.path.join(d, "supplier.parquet"))
    return d


def _brute(customers, suppliers, k=3):
    out = {}
    for sk, sb in suppliers:
        ranked = sorted(((abs(sb - cb), ck) for ck, cb in customers))[:k]
        out[sk] = [
            (r + 1, ck, round(d, 2)) for r, (d, ck) in enumerate(ranked)
        ]
    return out


def _run(spark, d):
    from skills_vectors_spark.operators.relational import join_cross_topk

    got = {}
    for r in join_cross_topk(spark, d).collect():
        got.setdefault(r.s_suppkey, []).append((r.rnk, r.c_custkey, r.bal_dist))
    return {k: sorted(v) for k, v in got.items()}


def test_cross_topk_mass_ties_and_equidistant_pairs(spark):
    """50 customers share one balance (tie-break must pick the 3
    smallest custkeys), and suppliers sit exactly between two values
    (s-d and s+d both present -> cross-value custkey interleave)."""
    customers = [(100 + i, 50.0) for i in range(50)]  # mass tie at 50
    customers += [(10, 40.0), (11, 60.0), (12, 45.0), (13, 55.0), (14, 30.0)]
    suppliers = [(1, 50.0), (2, 50.5), (3, 42.5), (4, 0.0), (5, 100.0)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute(customers, suppliers).items()
    }


def test_cross_topk_sparse_values_and_domain_edges(spark):
    """Fewer distinct values than K on a side: domain-edge suppliers
    and a 2-value corpus exercise the deficit/boundary path (every
    range partition holds < 2K values, so ALL suppliers resolve
    through the broadcast boundary rows)."""
    customers = [(1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0), (5, 90.0)]
    suppliers = [(1, 5.0), (2, 10.0), (3, 50.0), (4, 95.0), (5, 89.9)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute(customers, suppliers).items()
    }


def test_cross_topk_many_partition_edges(spark):
    """Dense distinct values with suppliers planted AT every few
    values — many suppliers land within K of a range-partition edge,
    exercising partial-candidates + boundary over-submission dedup."""
    customers = [(i, float(i)) for i in range(1, 401)]
    suppliers = [(j, float(j * 3) + 0.5) for j in range(1, 130)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute(customers, suppliers).items()
    }


def test_cross_topk_suppkeys_above_2_53_survive(spark):
    """Interleaved balances force range partitions that mix value
    rows with supplier rows — the layout where a NULL-unioned key
    column would render float64 in Arrow->pandas and int(sk) would
    lose the odd bit of keys > 2^53 (the confirmed r11 bug: 50 odd
    suppkeys collapsed to 26 even result keys). Fixed r12 by carrying
    a -1 sentinel instead of NULL on the value arm; this test was the
    strict xfail pin and now guards the fix."""
    base = 1 << 53
    customers = [(i, i * 0.5) for i in range(1, 201)]
    suppliers = [(base + 2 * j + 1, j * 2.0 + 0.25) for j in range(50)]
    d = _plant(customers, suppliers)
    got = _run(spark, d)
    assert sorted(got) == sorted(sk for sk, _ in suppliers)
    # full value-level parity, not just key survival
    assert got == {k: sorted(v) for k, v in _brute(customers, suppliers).items()}


def _brute_nulls(customers, suppliers, k=3):
    """Brute force with ANSI/DuckDB NULL semantics: NULL balance on
    either side -> NULL distance, ranked after every real distance
    (ASC NULLS LAST), tie-broken by custkey."""
    out = {}
    for sk, sb in suppliers:
        ranked = sorted(
            (
                (0, abs(sb - cb), ck) if sb is not None and cb is not None else (1, 0.0, ck)
                for ck, cb in customers
            )
        )[:k]
        out[sk] = [
            (r + 1, ck, round(d, 2) if is_null == 0 else None)
            for r, (is_null, d, ck) in enumerate(ranked)
        ]
    return out


def test_cross_topk_null_balances_rank_last(spark):
    """NULL c_acctbal customers must appear with NULL distance ranked
    after every real distance (the oracle's CROSS JOIN keeps them,
    NULLS LAST), and a NULL s_acctbal supplier ties ALL customers at
    NULL distance so its top-3 is the 3 smallest custkeys overall —
    the advisor-r10 divergence, closed r12 by the probe-guarded
    union arms."""
    customers = [(1, 10.0), (2, None), (3, None), (4, None), (5, None), (6, 90.0)]
    suppliers = [(1, 10.0), (2, None), (3, 50.0)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute_nulls(customers, suppliers).items()
    }


def test_cross_topk_all_null_customer_balances(spark):
    """Degenerate corpus: EVERY customer balance is NULL. The
    sorted-neighbor path sees an empty value set (every supplier
    resolves through the empty-boundary edge path) and the entire
    result must come from the NULL union arms: each non-null supplier
    gets the 3 smallest custkeys at NULL distance; the NULL supplier
    gets the same via the all-customers arm."""
    customers = [(9, None), (4, None), (7, None), (1, None), (2, None)]
    suppliers = [(1, 5.0), (2, None), (3, 50.0)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute_nulls(customers, suppliers).items()
    }


def test_cross_topk_fewer_customers_than_k(spark):
    """A corpus smaller than K on the customer side: each supplier's
    result has fewer than K rows, mixed NULL/non-NULL balances — the
    deficit path and the NULL arm must compose without duplicating or
    inventing rows."""
    customers = [(1, 10.0), (2, None)]
    suppliers = [(1, 9.0), (2, None)]
    d = _plant(customers, suppliers)
    assert _run(spark, d) == {
        k: sorted(v) for k, v in _brute_nulls(customers, suppliers).items()
    }


def test_cross_topk_randomized_corpora_match_brute_force(spark):
    """Randomized adversarial sweep: corpora drawn with heavy balance
    duplication (small discrete domain -> mass ties), a NULL fraction
    on both sides, and suppliers planted on, between, and outside the
    customer domain. Fixed seeds keep it deterministic; any mismatch
    is a real candidate-derivation or NULL-arm bug, not flake."""
    import random

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        domain = [round(rng.uniform(0, 100), 1) for _ in range(12)]
        customers = [
            (ck, rng.choice(domain) if rng.random() > 0.15 else None)
            for ck in rng.sample(range(1, 10_000), 120)
        ]
        suppliers = [
            (sk, bal)
            for sk, bal in zip(
                rng.sample(range(1, 10_000), 25),
                [rng.choice(domain) for _ in range(10)]          # on-value
                + [round(rng.uniform(-50, 150), 2) for _ in range(12)]  # off/outside
                + [None, None, None],                            # NULL side
            )
        ]
        d = _plant(customers, suppliers)
        got = _run(spark, d)
        want = {k: sorted(v) for k, v in _brute_nulls(customers, suppliers).items()}
        assert got == want, f"seed {seed} diverged"
