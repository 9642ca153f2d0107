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
# head modules (see load_all): the set that has no green attested
# row yet (win_lag_lead: red in r1 from the since-fixed ts loader;
# agg_approx_distinct: oracle added after its last sweep;
# embed_project_pca: output schema fixed after its r2 error;
# eval_recall_lsh / eval_backend_compare: gate-column oracles are
# new) plus the flagship KNN pair so the headline operator keeps a
# row in every sweep.
_PROMOTED = [
    "win_lag_lead",
    "agg_approx_distinct",
    "embed_project_pca",
    "eval_recall_lsh",
    "eval_backend_compare",
    "knn_exact",
    "knn_filtered",
]

# Registered in a head module but pushed BEHIND the promoted block:
# added late in the round with the 50-slot sweep window already
# fully allocated (43 head + 7 promoted). They hold the front of the
# next rotation.
_DEFERRED = [
    "mix_corpus",
    "split_train_eval",
]


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back). The head of the
    order is the surface with the least accumulated verification
    signal: the scalar-function families every real query touches
    (functions_suite), the text-analysis tail, and the scale/scale2
    sets — followed by the individually promoted queries in
    ``_PROMOTED`` — so a bounded front-to-back sweep always lands on
    the operators whose correctness is least attested.
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

    # Reorder deterministically — not by import-time insertion, which
    # test collection or ad-hoc imports can perturb. Within-module
    # registration order is always file order (a module registers all
    # of its queries during its single import), so grouping by each
    # query's defining module gives a stable canonical order.
    head_modules = ["functions_suite", "textstats", "scale", "scale2"]
    mod_of = {n: fn.__module__.rsplit(".", 1)[-1] for n, fn in QUERIES.items()}
    deferred = set(_DEFERRED)
    order = [n for m in head_modules for n in QUERIES if mod_of[n] == m and n not in deferred]
    seen = set(order)
    order += [n for n in _PROMOTED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [n for n in _DEFERRED if n in QUERIES and n not in seen]
    seen.update(order)
    order += [n for n in QUERIES if n not in seen]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
