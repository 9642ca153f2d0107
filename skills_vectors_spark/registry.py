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


# Round-5 window: (a) queries whose code or oracle changed or that
# are NEW this round and therefore must attest on current code
# (dedup_url rewrite + integer-div fix, the agg_percentile two-pass
# rebuild, eval_recall_lsh's cross-engine recall oracle, the scale3
# cache-unpersist hygiene, scan_binaryfile fixture-dir cleanup, the
# three newly activated arbitrary-state queries, and the analytics
# pair); then (b) the r2-vintage families the r4 verdict ordered
# rotated in — dedup's seven oracle-backed r2 rows (the file took
# additive edits in r3 AND r4 since those rows), all five multimodal
# queries, the embed trio, the knn quartet, the vector_blas trio,
# and the seven r2 streaming queries — after which every
# oracle-backed query's latest green row is at most two rounds old.
_PROMOTED = [
    # (a) changed this round — least-attested surface, sweep first
    # (scrub_pii and search_hybrid_rrf were slated for perf work but
    # measured under/at the bar once benched in isolation, so their
    # code is untouched and their r4 rows stand — no slot needed)
    "dedup_url",
    "eval_recall_lsh",
    "stream_transform_state",
    "stream_transform_topk",
    "stream_transform_typecounts",
    "retention_cohorts",
    "seq_transitions",
    "ts_gapfill",
    "quality_entropy",
    "graph_pagerank",
    "agg_heavy_hitters",
    "join_bloom_prefilter",
    "scan_binaryfile",
    "agg_percentile",
    # (b) r2-vintage rotation: dedup family (r2 rows, file edited
    # additively in r3+r4)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embed_cosine",
    "dedup_apply",
    "dedup_containment",
    "dedup_decontaminate",
    # multimodal family (r2 rows)
    "mm_image_features",
    "mm_frame_sample",
    "mm_metadata_stats",
    "mm_audio_features",
    "mm_arrow_bytes",
    # embed family (r2 rows)
    "embed_mock",
    "embed_with_status",
    "embed_provider_switch",
    # knn family (r2 rows)
    "knn_exact_l2",
    "eval_avgsim",
    "eval_recall",
    "report_pivot",
    # vector_blas (r2/r3 rows)
    "dedup_embed_cosine_blas",
    "sim_topk_bruteforce",
    "embed_project_pca",
    # streaming r2 rows (stream_foreach_batch re-attested r4)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_stateful",
    "stream_dedup_late",
    "stream_enrich",
    "stream_join_interval",
]

# Relational §2.B rows already re-attested in r4 (the four
# sources/sinks) or r3 (two window/agg rewrites): exclude them from
# the r1 backfill so the window slots go to the stalest rows.
_BACKFILL_SKIP = {
    "scan_parquet",
    "scan_csv",
    "sink_parquet",
    "sink_overwrite",
    "agg_approx_distinct",
    "win_lag_lead",
}

# No deferrals this rotation: every registered query either sits in
# the current 50-slot window or already has a green row on current
# code from r1-r3.
_DEFERRED: list[str] = []


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal. Round-5 rotation (the r4 verdict's top ask): queries
    changed this round first, then the r2-vintage families
    (dedup/multimodal/embed/knn/vector_blas/streaming) whose green
    rows are two rounds old, then relational r1 backfill (file order,
    minus the rows re-attested in r3/r4) — so a bounded front-to-back
    sweep always lands on the operators whose correctness is least
    attested on CURRENT code.
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

    # Reorder deterministically — not by import-time insertion, which
    # test collection or ad-hoc imports can perturb. Within-module
    # registration order is always file order (a module registers all
    # of its queries during its single import), so grouping by each
    # query's defining module gives a stable canonical order.
    head_modules: list[str] = []
    backfill_modules = ["relational"]
    mod_of = {n: fn.__module__.rsplit(".", 1)[-1] for n, fn in QUERIES.items()}
    deferred = set(_DEFERRED)
    order = [n for m in head_modules for n in QUERIES if mod_of[n] == m and n not in deferred]
    seen = set(order)
    order += [n for n in _PROMOTED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [
        n
        for m in backfill_modules
        for n in QUERIES
        if mod_of[n] == m and n not in seen and n not in deferred and n not in _BACKFILL_SKIP
    ]
    seen.update(order)
    order += [n for n in _DEFERRED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [n for n in QUERIES if n not in seen]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
