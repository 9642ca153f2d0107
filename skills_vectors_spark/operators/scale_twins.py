"""Driver-facing registrations of scale-twin operators.

Some operators keep two equal-output forms: a headline form whose
plan wins at the benched tiers, and a "100 TB twin" that trades a
constant factor for a shape with no parallelism collapse. The twins
were previously exercised only through bench.py's _extras and pytest
equality gates; registering them here gives each an oracle-backed
driver row of its own (same oracle as the headline — the outputs are
defined to be identical), so the claimed at-scale form carries the
same correctness attestation as the form it would replace.

Provenance: the Gini seat mirrors the reference's grouped scoring
aggregations (skills_for_jobs.py:88-104) applied to inequality
auditing of per-source budgets; the distributed-rank construction is
the standard bucket-offset exact ranking (same machinery as
agg_percentile's log-bucket histogram, relational2.py:198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from skills_vectors_spark.registry import register

_GINI_ORACLE = """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rk
      FROM orders
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round((2.0 * sum(rk * o_totalprice)
                  - (count(*) + 1) * sum(o_totalprice))
                 / (count(*) * sum(o_totalprice)) * 1e6) / 1e6 AS gini
    FROM r GROUP BY o_orderpriority
"""


@register("agg_gini_distributed", _GINI_ORACLE)
def agg_gini_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_gini's 100 TB form, driver-attested: exact per-group Gini
    with DISTRIBUTED ranking — rows rank locally within (group,
    log-bucket) cells and global rank = broadcast cumulative offset +
    local rank, so no group ever sorts on a single task (the headline
    agg_gini's 5-value partition key would). Output is defined to be
    identical to agg_gini, hence the identical oracle; the equality is
    also pytest-gated at three tiers. See
    relational2.agg_gini_distributed for the construction.
    """
    from skills_vectors_spark.operators.relational2 import (
        agg_gini_distributed as _impl,
    )

    return _impl(spark, sf_dir)
