import math

from pyspark.sql import functions as F

from skills_vectors_spark.functions.vector import cosine_sim, l2_dist
from skills_vectors_spark.operators import knn


def test_cosine_macro_matches_numpy(spark):
    import numpy as np

    a = [1.0, 2.0, 3.0, 4.0]
    b = [-2.0, 0.5, 1.0, 3.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(cosine_sim("a", "b").alias("c"), l2_dist("a", "b").alias("l")).first()
    va, vb = np.array(a), np.array(b)
    assert math.isclose(got.c, float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), rel_tol=1e-12)
    assert math.isclose(got.l, float(np.linalg.norm(va - vb)), rel_tol=1e-12)


def test_knn_exact_shape(spark, sf_dir):
    out = knn.knn_exact(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == knn.N_QUERIES * knn.K
    assert out.columns == ["q_id", "rnk", "c_id", "cos_sim"]
    # no self matches; ranks are 1..K per query; cosine descending per query
    by_q = {}
    for r in rows:
        assert r.q_id != r.c_id
        by_q.setdefault(r.q_id, []).append((r.rnk, r.cos_sim))
    for q, hits in by_q.items():
        hits.sort()
        assert [h[0] for h in hits] == list(range(1, knn.K + 1))
        sims = [h[1] for h in hits]
        assert sims == sorted(sims, reverse=True)


def test_report_pivot_consistent_with_knn(spark, sf_dir):
    top = {(r.q_id, r.rnk): r.c_id for r in knn.knn_exact(spark, sf_dir).collect()}
    wide = knn.report_pivot(spark, sf_dir).collect()
    assert len(wide) == knn.N_QUERIES
    for row in wide:
        for r in range(knn.K):
            assert row[f"skill{r}"] == top[(row.q_id, r + 1)]


def test_knn_plan_broadcasts_queries(spark, sf_dir):
    plan = knn.knn_exact(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_eval_recall_bounds(spark, sf_dir):
    rows = knn.eval_recall(spark, sf_dir).collect()
    assert len(rows) == knn.N_QUERIES
    for r in rows:
        assert 0 <= r.n_match <= knn.K
        assert math.isclose(r.recall, r.n_match / knn.K, rel_tol=1e-9)
