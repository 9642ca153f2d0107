"""Driver-facing registrations of scale-twin operators.

Some operators keep two equal-output forms: a headline form whose
plan wins at the benched tiers, and a "100 TB twin" that trades a
constant factor for a shape with no parallelism collapse (or bounded
sketch state instead of exact buffers). The twins were previously
exercised only through bench.py's _extras and pytest gates;
registering them here gives each an oracle-backed driver row of its
own, so the claimed at-scale form carries the same correctness
attestation as the form it would replace.

Two oracle shapes, both established elsewhere in the registry:

* EQUALITY twins (agg_gini_distributed, dedup_ngram_jaccard_
  production): the twin's output is deterministic and
  SQL-expressible, so it shares (or derives) a full value oracle.
* GATE twins (approx_percentile / hll_sketch / anomaly_mad
  _production): the production form is a sketch whose exact value is
  engine-specific, so the REGISTERED row wraps the production plan
  with an attestation arm — exact columns that must match DuckDB
  bit-for-bit after rounding, plus booleans binding the sketch to
  them (the agg_approx_percentile / sample_stratified emit-the-gate
  shape). The wrapped exact arm is attestation scaffolding only: the
  production functions in analytics.py / relational2.py / scale2.py
  stay sketch-only and are what bench.py's _extras time.

Provenance: the Gini seat mirrors the reference's grouped scoring
aggregations (skills_for_jobs.py:88-104) applied to inequality
auditing of per-source budgets; the sketch twins generalize the
reference's in-list dedup + scoring passes (skills_for_jobs.py:
371-379) to the constant-memory forms a 100 TB deployment runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skills_vectors_spark import sources
from skills_vectors_spark.registry import register


def _gini_oracle() -> str:
    # late import keeps module import order irrelevant; the literal
    # itself lives next to the headline (advisor r8: ONE literal,
    # shared, so the twin's same-oracle contract cannot desync)
    from skills_vectors_spark.operators.relational2 import GINI_ORACLE

    return GINI_ORACLE


@register("agg_gini_distributed", _gini_oracle())
def agg_gini_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_gini's 100 TB form, driver-attested: exact per-group Gini
    with DISTRIBUTED ranking — rows rank locally within (group,
    log-bucket) cells and global rank = broadcast cumulative offset +
    local rank, so no group ever sorts on a single task (the headline
    agg_gini's 5-value partition key would). Output is defined to be
    identical to agg_gini, hence the SHARED oracle literal
    (relational2.GINI_ORACLE); the equality is also pytest-gated at
    three tiers. See relational2.agg_gini_distributed for the
    construction.
    """
    from skills_vectors_spark.operators.relational2 import (
        agg_gini_distributed as _impl,
    )

    return _impl(spark, sf_dir)


@register(
    "approx_percentile_production",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5) * 1e4) / 1e4 AS p50_exact,
           TRUE AS sketch_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the sketch-ONLY percentile twin
    (relational2.approx_percentile_production — the plan bench.py's
    _extras time, claimed as the 100 TB swap-in for agg_percentile).
    The sketch value is engine-specific, so the registered row wraps
    the production plan with an attestation arm: the exact p50 (must
    match DuckDB's quantile_cont bit-for-bit after rounding) plus a
    boolean binding the sketch to within 5% of it. The exact arm is
    scaffolding for THIS row only; the production function stays
    sketch-only."""
    from skills_vectors_spark.operators.relational2 import (
        approx_percentile_production as _prod,
    )

    prod = _prod(spark, sf_dir)
    exact = (
        sources.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"))
    )
    return prod.join(exact, "l_returnflag").select(
        "l_returnflag",
        (F.round(F.col("p50_exact") * 1e4) / 1e4).alias("p50_exact"),
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact")
            <= 0.05
        ).alias("sketch_within_5pct"),
    )


@register(
    "hll_sketch_production",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS sketch_within_5pct
    FROM events
    """,
)
def hll_sketch_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the sketch-ONLY HLL twin
    (scale2.hll_sketch_production: per-group sketches + a grand total
    merged from sketch BYTES, never from raw rows — the mergeability
    that makes HLL the 100 TB distinct-count form). The estimate is
    engine-specific, so the registered row joins the production
    output to exact distinct counts (cross-engine comparable) and
    emits the 5% accuracy gate; the production function itself stays
    sketch-only for bench _extras."""
    from skills_vectors_spark.operators.scale2 import (
        hll_sketch_production as _prod,
    )

    ev = sources.load(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    grand = ev.agg(
        F.lit("__all__").alias("event_type"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    # null-safe join key: a NULL event_type group exists on both
    # sides, and a plain equi-join would silently drop it
    ex = exact.unionByName(grand).withColumnRenamed("event_type", "et_x")
    return (
        _prod(spark, sf_dir)
        .join(ex, F.col("event_type").eqNullSafe(F.col("et_x")))
        .drop("et_x")
        .select(
            "event_type",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= 0.05
            ).alias("sketch_within_5pct"),
        )
    )


@register(
    "anomaly_mad_production",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS med_in_bounds, TRUE AS mad_in_bounds
    FROM events GROUP BY user_id
    """,
)
def anomaly_mad_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the sketch-tier MAD twin
    (analytics.anomaly_mad_production: approx_percentile replaces the
    exact per-user percentile so group state is a bounded sketch).
    approx_percentile returns an ELEMENT whose rank error is < 1 for
    groups smaller than its accuracy (10000), so the deterministic
    attestation is a BOUNDS gate rather than a 5% band: the sketch
    median must land between the group's two middle order statistics
    (equal for odd n), and the sketch MAD between the two middle
    absolute deviations FROM that sketch median — both computed here
    from per-user sorted value lists (bounded: ~100 events/user; this
    arm is attestation scaffolding, not the production plan). The
    exact per-user event count anchors the row cross-engine."""
    from skills_vectors_spark.operators.analytics import (
        anomaly_mad_production as _prod,
    )

    prod = _prod(spark, sf_dir)  # user_id, n_events, med, mad, n_outliers
    sv = (
        sources.load(spark, sf_dir, "events")
        .select("user_id", "value")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("value")).alias("sv"))
    )
    j = prod.join(sv, "user_id")
    n = F.size("sv")
    lo_i = F.floor((n + 1) / 2).cast("int")
    hi_i = F.ceil((n + 1) / 2).cast("int")
    med_lo = F.element_at("sv", lo_i)
    med_hi = F.element_at("sv", hi_i)
    devs = F.array_sort(F.transform("sv", lambda x: F.abs(x - F.col("med"))))
    mad_lo = F.element_at(devs, lo_i)
    mad_hi = F.element_at(devs, hi_i)
    eps = 1e-6  # the production med/mad are rounded to 1e-6
    # collect_list drops NULLs, so a user whose values are ALL NULL
    # yields an empty sv (n = 0) — element_at(sv, 0) would raise
    # (Spark arrays are 1-indexed) and the sketch med is NULL anyway.
    # Gate such users TRUE, matching the oracle's unconditional TRUE
    # (advisor r10); CASE WHEN evaluates only the taken branch, so the
    # element_at never runs for empty lists.
    return j.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.when(
            n > 0, (F.col("med") >= med_lo - eps) & (F.col("med") <= med_hi + eps)
        )
        .otherwise(F.lit(True))
        .alias("med_in_bounds"),
        F.when(
            n > 0, (F.col("mad") >= mad_lo - eps) & (F.col("mad") <= mad_hi + eps)
        )
        .otherwise(F.lit(True))
        .alias("mad_in_bounds"),
    )


def _ngram_production_oracle() -> str:
    from skills_vectors_spark.operators.dedup import (
        D_SHINGLES,
        JACCARD_THRESHOLD,
        NGRAM_PROD_MAX_DF,
    )

    return f"""
    WITH sh0 AS (
      SELECT DISTINCT doc_id, unnest({D_SHINGLES}) AS s FROM documents
    ), keep AS (
      SELECT s FROM sh0 GROUP BY s HAVING count(*) <= {NGRAM_PROD_MAX_DF}
    ), sh AS (
      SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(i::DOUBLE / (sa.n + sb.n - i) * 1e6) / 1e6 AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE i::DOUBLE / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
    """


@register("dedup_ngram_jaccard_production", _ngram_production_oracle())
def dedup_ngram_jaccard_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the max_df-capped Jaccard twin
    (dedup.dedup_ngram_jaccard_production — the 100 TB form: shingles
    shared by more than NGRAM_PROD_MAX_DF docs are dropped before the
    self-join, removing the hot keys that make pair generation
    superlinear). Unlike the sketch twins this one is fully
    DETERMINISTIC — the cap is a document-frequency predicate both
    engines can evaluate — so it carries a complete EQUALITY oracle:
    the same capped-shingle Jaccard computed in DuckDB, value for
    value. (Jaccard here is over the capped sets by contract; pair
    membership at the threshold is what the cap preserves, measured
    in SCALING.md's 10x recall row.)"""
    from skills_vectors_spark.operators.dedup import (
        dedup_ngram_jaccard_production as _impl,
    )

    return _impl(spark, sf_dir)
