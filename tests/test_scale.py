"""Scale-surface operators: partition pruning, bucketed co-located
joins, salting equivalence, hypertable rollup, and connected-component
dedup clustering."""

from pyspark.sql import functions as F

from skills_vectors_spark.operators import dedup, scale
from skills_vectors_spark.plans import PlanFacts, formatted_plan, physical_plan


def test_sink_partitioned_prunes_partitions(spark, sf_dir):
    df = scale.sink_partitioned(spark, sf_dir)
    fmt = formatted_plan(df)
    assert "PartitionFilters: [" in fmt, "date filter must prune hive partitions"
    # the pruned read must still return exactly the filtered day
    dates = [r.event_date for r in df.select("event_date").distinct().collect()]
    assert dates == [scale.PARTITION_DATE]


def test_sink_bucketed_join_has_no_exchange(spark, sf_dir):
    df = scale.sink_bucketed(spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "Join" in plan


def test_join_skew_salted_equals_plain_join(spark, sf_dir):
    from skills_vectors_spark import sources

    salted = {
        (r.c_mktsegment): (r.n_events, r.sum_value)
        for r in scale.join_skew_salted(spark, sf_dir).collect()
    }
    ev = sources.load(spark, sf_dir, "events")
    cust = sources.load(spark, sf_dir, "customer")
    plain = {
        (r.c_mktsegment): (r.n_events, r.sum_value)
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value") * 100) / 100).alias("sum_value"),
        )
        .collect()
    }
    assert salted == plain


def test_rollup_hypertable_consistency(spark, sf_dir):
    rows = scale.rollup_hypertable(spark, sf_dir).collect()
    total = [r for r in rows if r.bucket_day is None]
    days = [r for r in rows if r.bucket_day is not None and r.bucket_hour is None]
    assert len(total) == 1
    assert total[0].n == sum(r.n for r in days), "day rows must sum to the grand total"


def test_dedup_clusters_match_union_find(spark, sf_dir):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").collect()
    ]
    got = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, sf_dir).collect()}

    # reference union-find on the same edges
    parent: dict[int, int] = {d: d for d in got}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in got}
    assert got == want
    # non-trivial at sf0.001: at least one multi-doc cluster
    assert any(v != k for k, v in got.items()), "expected at least one merged cluster"


def test_sink_clustered_pushes_key_filter(spark, sf_dir):
    df = scale.sink_clustered(spark, sf_dir)
    fmt = formatted_plan(df)
    assert "PushedFilters: [" in fmt and "EqualTo(user_id" in fmt, (
        "key predicate must reach the parquet scan for row-group pruning"
    )
    users = df.select("user_id").distinct().collect()
    assert [r.user_id for r in users] == [scale.CLUSTER_USER]


def test_dedup_apply_keeps_cluster_minima(spark, sf_dir):
    from skills_vectors_spark import sources

    clusters = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, sf_dir).collect()}
    kept = {r.doc_id for r in dedup.dedup_apply(spark, sf_dir).collect()}
    want = {d for d, c in clusters.items() if c == d}
    assert kept == want
    n_docs = sources.load(spark, sf_dir, "documents").count()
    assert len(kept) < n_docs, "test corpus contains near-dups to drop"
