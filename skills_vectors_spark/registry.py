"""Query registry: the single source of truth behind the driver
contract (__spark_entry__.py::queries / oracle_sql).

Each operator module registers `name -> callable(spark, sf_dir) ->
DataFrame`, optionally with a DuckDB oracle SQL string. Ops that are
not ANSI-SQL-expressible (LSH, mock embedding, streaming-stateful)
register without an oracle and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            if "--" in oracle:
                raise ValueError(
                    f"oracle for {name!r} contains a '--' SQL comment; whitespace "
                    "collapsing would comment out the rest of the statement"
                )
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# Round-13 window, FINAL (re-curated after the late-r13
# degenerate-input differential pass — zero-row / NULL-heavy /
# constant corpora, SCALING.md r13): rows whose ORACLE SQL or output
# semantics changed this round outrank everything, then rows whose
# Spark expressions changed with values verified identical, then the
# earlier-r13 re-plans that still fit. All 189 were value-verified
# on final code by the full driver simulation AND the three
# degenerate-tier sweeps; the window lists the rows the driver must
# formally grade because their contract moved:
# (a) the dedup family — word_shingles NULL semantics (NULL text no
#   longer fabricates [''] and pairs with every other NULL doc),
#   minhash/simhash None guards, dedup_near's UDF-safe sentinel, and
#   the late-r13 minhash/simhash oracle promotions;
# (b) embed family — NULL text embeds to no row (oracles aligned),
#   provider_switch's deterministic non-null cap;
# (c) BLAS kernels — tie-complete top-k pool + 1e-6-grain rank keys
#   (sim_topk_bruteforce oracle changed), NULL-corpus load guard;
# (d) relevance/corpus_eval — text_tfidf_sim / eval_ndcg_mrr rank at
#   the output grain (oracles changed);
# (e) streaming — stream_stateful's SQL-NULL aggregate semantics,
#   foreachBatch explicit read-back schema, stream_ann_assign's
#   coalesced gate; the TWS trio's is_nan schema (earlier r13);
# (f) NULL-aggregate fixes — agg_mode / agg_minmax_by (oracles
#   changed), the hll pair's null-safe group join;
# (g) zero-variance fixes — corr via guarded covar/stddev,
#   nullif'd moments and z-statistic (agg_moments / eval_ab_lift
#   oracles changed);
# (h) empty-corpus guards with plan or gate changes — ANN gate
#   recall_ok vacuous-true arm, sink read-back schemas, image/blob
#   planting skips NULL docs (oracles changed);
# (i) earlier-r13 re-plans that keep their slots: bloom single-scan,
#   substring single-pass, percentile fragment rework.
# Left OUT on plan-only-value-identical grounds (full-sim green):
# bm25 / rrf / perplexity / entropy / zipf / pmi (cold re-plan only),
# graph_pagerank + scan_npy (empty-branch guards not taken on real
# corpora), agg_winsorized_mean / agg_approx_percentile (machinery
# shared with the in-window agg_percentile), eval_recall_lsh (file
# shared with the in-window ann gates). Queued first for r14.
_PROMOTED = [
    # (a) dedup stratum
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_production",
    "dedup_containment",
    "dedup_clusters",
    "dedup_apply",
    "dedup_decontaminate",
    "dedup_incremental",
    "dedup_near",
    "dedup_minhash",
    "dedup_simhash",
    "eval_dedup_compare",
    # (b) embed stratum
    "embed_mock",
    "embed_provider_switch",
    "embed_knn_pipeline",
    "embed_project_pca",
    # (c) BLAS kernels
    "sim_topk_bruteforce",
    "dedup_embed_cosine_blas",
    # (d) output-grain rank keys
    "text_tfidf_sim",
    "eval_ndcg_mrr",
    # (e) streaming
    "stream_stateful",
    "stream_foreach_batch",
    "stream_ann_assign",
    "stream_transform_state",
    "stream_transform_topk",
    "stream_transform_typecounts",
    # (f) NULL-aggregate semantics
    "agg_mode",
    "agg_minmax_by",
    "agg_hll_sketch",
    "hll_sketch_production",
    # (g) zero-variance arithmetic
    "agg_stats",
    "agg_corr_matrix",
    "agg_moments",
    "eval_ab_lift",
    # (h) empty-corpus guards with gate/oracle changes
    "ann_lsh",
    "ann_ivf",
    "ann_brp_l2",
    "ann_pq",
    "ann_ivf_pq",
    "eval_backend_compare",
    "sink_ann_index",
    "sink_partitioned",
    "sink_upsert_partition",
    "scan_binaryfile",
    "mm_image_features",
    "mm_image_resize",
    "text_chunk",
    "fingerprint_rolling",
    # (i) earlier-r13 re-plans keeping their slots
    "join_bloom_prefilter",
    "dedup_substring",
    "agg_percentile",
]
# r14 rotation queue (oldest/displaced first): the plan-only rows
# left out above — text_bm25_search, search_hybrid_rrf,
# quality_perplexity, quality_entropy, text_zipf_slope,
# text_pmi_bigrams, graph_pagerank, scan_npy, agg_winsorized_mean,
# agg_approx_percentile, eval_recall_lsh — then the r8/r10
# remainder (text_ngram_novelty, mix_temperature, quality_drift_psi,
# knn_filtered, anomaly_mad, agg_gini(+_distributed),
# sink_merge_rows, stream_sink_files, stream_late_metrics, the
# relational.py r12 cohort) and whatever r13's verdict stales.
_DEFERRED: list[str] = []


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal. Round-13 final rotation: every row whose oracle or
    output semantics moved in the degenerate-input differential pass
    (zero-row / NULL-heavy / constant corpora), plus the earlier-r13
    schema and re-plan changes that still fit. The explicit 50-entry
    _PROMOTED list IS the window; what follows it is queued in the
    r14 rotation comment above.
    """
    import skills_vectors_spark.operators.functions_suite  # noqa: F401
    import skills_vectors_spark.operators.textstats  # noqa: F401
    import skills_vectors_spark.operators.scale  # noqa: F401
    import skills_vectors_spark.operators.scale2  # noqa: F401
    import skills_vectors_spark.operators.knn  # noqa: F401
    import skills_vectors_spark.operators.ann  # noqa: F401
    import skills_vectors_spark.operators.dedup  # noqa: F401
    import skills_vectors_spark.operators.vector_blas  # noqa: F401
    import skills_vectors_spark.operators.embed  # noqa: F401
    import skills_vectors_spark.operators.multimodal  # noqa: F401
    import skills_vectors_spark.streaming.windows  # noqa: F401
    import skills_vectors_spark.operators.relevance  # noqa: F401
    import skills_vectors_spark.operators.relational  # noqa: F401
    import skills_vectors_spark.operators.relational2  # noqa: F401
    import skills_vectors_spark.operators.scale3  # noqa: F401
    import skills_vectors_spark.operators.multimodal2  # noqa: F401
    import skills_vectors_spark.operators.analytics  # noqa: F401
    import skills_vectors_spark.operators.corpus_eval  # noqa: F401
    import skills_vectors_spark.operators.corpusprep  # noqa: F401
    import skills_vectors_spark.operators.scale_twins  # noqa: F401

    # Only the _PROMOTED window (and the _DEFERRED head after it) is
    # order-stable: those names are pinned explicitly, so the
    # driver's first-50 sweep is deterministic regardless of import
    # order. The tail keeps raw QUERIES insertion order — an ad-hoc
    # operator import before load_all() can shift tail positions,
    # which only affects beyond-window sweep order, never membership
    # or the graded window (advisor r6: comment corrected).
    order = [n for n in _PROMOTED if n in QUERIES]
    seen = set(order)
    order += [n for n in _DEFERRED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [n for n in QUERIES if n not in seen]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
