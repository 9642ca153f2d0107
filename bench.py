"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query executes fully via the noop sink (no result serialization
to Python — measures the engine, not the driver pickle path).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from skills_vectors_spark import registry
from skills_vectors_spark.session import get_spark

registry.load_all()

HEADLINE = [
    "knn_exact",
    "knn_exact_l2",
    "ann_lsh",
    "ann_ivf",
    "ann_ivf_pq",
    "eval_recall",
    "report_pivot",
    "embed_knn_pipeline",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embed_cosine_blas",
    "dedup_decontaminate",
    "sim_topk_bruteforce",
    "text_stats",
    "lang_id",
    "quality_score",
    "agg_hash",
    "agg_rollup",
    "join_inner_hash",
    "join_cross_topk",
    "win_rank_topk",
    "win_running",
    "sort_limit",
    "join_asof",
    "agg_percentile",
    "grouped_zscore",
    "join_skew_salted",
    "rollup_hypertable",
    "dedup_clusters",
    "stream_tumbling",
    "stream_session",
    "stream_stateful",
    "join_range_binned",
    "sessionize_batch",
    "agg_hll_sketch",
    "quality_filter_apply",
    "text_tfidf_sim",
    "text_bm25_search",
    "search_hybrid_rrf",
    "knn_filtered",
    "dedup_containment",
    "quality_repetition",
    "scrub_pii",
    "mix_temperature",
    "dedup_incremental",
    "dedup_substring",
    "text_normalize",
    "dedup_url",
    "scd2_history",
    "graph_pagerank",
    "agg_heavy_hitters",
    "dedup_normalized",
    "stream_cms_counters",
    "join_bloom_prefilter",
    "scan_binaryfile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, codegen, and shuffle machinery with one tiny
    # join+window+agg on the smallest tables so the first timed query
    # measures the engine, not cold-start compilation
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("rn", F.row_number().over(Window.partitionBy("r_regionkey").orderBy("n_name")))
        .groupBy("r_regionkey")
        .agg(F.count("*"), F.avg("rn"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # two passes, min per query: steady-state engine time, not
    # GC/compilation/host-contention outliers. The session-scoped
    # subtree cache is CLEARED at each pass start so every pass
    # computes the shared pipelines at least once — within a pass
    # later consumers read the persisted stage (the production
    # amortization), but a cached full result from a previous pass
    # never masquerades as query execution.
    from skills_vectors_spark import cache

    # sketch-only production variants: the constant-memory forms the
    # exact+gate registered queries trade into at 100 TB. Benched
    # alongside so the production path has its own wall-clock row.
    from skills_vectors_spark.operators.dedup import dedup_ngram_jaccard_production
    from skills_vectors_spark.operators.relational2 import approx_percentile_production
    from skills_vectors_spark.operators.scale2 import hll_sketch_production

    extras = {
        "approx_percentile_production": approx_percentile_production,
        "hll_sketch_production": hll_sketch_production,
        "dedup_ngram_jaccard_production": dedup_ngram_jaccard_production,
    }

    timings: dict[str, float] = {}
    for _ in range(2):
        cache.clear()
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
        for name, fn in extras.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    sf = Path(sf_dir).name.replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
