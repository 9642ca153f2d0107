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


# Queries promoted into the bounded-sweep window right after the
# head modules (see load_all): the r3 additions that never had a
# driver row (mix_corpus / split_train_eval were deferred out of the
# full r3 window; eval_dedup_compare is the cross-tier dedup quality
# gate), stream_foreach_batch (sink rewritten — parquet-backed store
# — after its last green row), the r4 additions (four early-r4 ops
# plus the seven scale3 ops), and r3-green queries re-attested after
# r4 code changes.
_PROMOTED = [
    "mix_corpus",
    "split_train_eval",
    "eval_dedup_compare",
    "stream_foreach_batch",
    "quality_repetition",
    "scrub_pii",
    "mix_temperature",
    "dedup_incremental",
    # r3-green queries whose behavior-relevant code changed in r4
    # (token_count macro null-wrap; scan_npy seeding cap) — re-attest
    # on current code rather than carrying a stale row
    "token_count",
    "text_stats",
    "scan_npy",
    "dedup_substring",
    # r4 scale3 additions (operators/scale3.py) — never driver-checked
    "text_normalize",
    "dedup_url",
    "scd2_history",
    "graph_pagerank",
    "agg_heavy_hitters",
    "dedup_normalized",
    "stream_cms_counters",
    "mm_image_resize",
    "join_bloom_prefilter",
    "scan_binaryfile",
]

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
    signal. Round-4 rotation: relational2 (9 of its queries only ever
    saw the r1 events-loader error, since fixed; agg_percentile and
    both sql_api_* were rewritten by r3 perf work after their green
    rows), then relevance (the _term_freqs Arrow fusion postdates the
    trio's green rows; search_hybrid_rrf is new), then the promoted
    r3 newcomers in ``_PROMOTED``, then relational backfill (§2.B
    core, re-attesting the r1 rows) — so a bounded front-to-back
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

    # Reorder deterministically — not by import-time insertion, which
    # test collection or ad-hoc imports can perturb. Within-module
    # registration order is always file order (a module registers all
    # of its queries during its single import), so grouping by each
    # query's defining module gives a stable canonical order.
    head_modules = ["relational2", "relevance"]
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
        if mod_of[n] == m and n not in seen and n not in deferred
    ]
    seen.update(order)
    order += [n for n in _DEFERRED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [n for n in QUERIES if n not in seen]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
