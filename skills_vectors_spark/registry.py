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


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is the priority order for bounded verification
    sweeps (tools/driver_sim.py's first-N window, spot checks, and any
    consumer that samples the registry front-to-back): the flagship
    vector / dedup / multimodal / streaming surface registers first so
    a partial sweep always covers the operators this engine exists
    for, with the broad relational families after.
    """
    import skills_vectors_spark.operators.knn  # noqa: F401
    import skills_vectors_spark.operators.ann  # noqa: F401
    import skills_vectors_spark.operators.dedup  # noqa: F401
    import skills_vectors_spark.operators.vector_blas  # noqa: F401
    import skills_vectors_spark.operators.embed  # noqa: F401
    import skills_vectors_spark.operators.multimodal  # noqa: F401
    import skills_vectors_spark.streaming.windows  # noqa: F401
    import skills_vectors_spark.operators.relevance  # noqa: F401
    import skills_vectors_spark.operators.textstats  # noqa: F401
    import skills_vectors_spark.operators.functions_suite  # noqa: F401
    import skills_vectors_spark.operators.relational  # noqa: F401
    import skills_vectors_spark.operators.relational2  # noqa: F401
    import skills_vectors_spark.operators.scale  # noqa: F401
    import skills_vectors_spark.operators.scale2  # noqa: F401
