"""Loader contract tests: native µs timestamps pass through, and a
TIMESTAMP(NANOS) corpus triggers the guarded legacy-conf fallback
(truncate to µs, conf restored)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import types as T

from skills_vectors_spark import sources

CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_events_native_us_reads_as_ntz(spark, sf_dir):
    df = sources.load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    assert spark.conf.get(CONF, "false") == "false", "loader must not leak conf"


@pytest.fixture()
def nanos_dir():
    d = tempfile.mkdtemp(prefix="svs_nanos_")
    ts = pa.array(
        np.array([1700000000123456789, 1700000001987654321], dtype="int64"),
        pa.timestamp("ns"),
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"), coerce_timestamps=None)
    return d


def test_events_nanos_fallback_truncates_and_restores_conf(spark, nanos_dir):
    df = sources.load(spark, nanos_dir, "events")
    rows = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    # nanos truncate to µs: ...123456789 ns -> ...123456 µs
    assert rows[1].microsecond == 123456
    assert rows[2].microsecond == 987654
    assert spark.conf.get(CONF, "false") == "false", "conf must be restored"


def test_load_spread_parallelizes_single_partition_scan(spark, sf_dir):
    """A one-row-group parquet file scans as a single partition; the
    spread policy must raise it to default parallelism so CPU-heavy
    narrow stages don't run on one core (measured 4x-32x at sf0.1/10x
    on ngram extraction and the all-pairs cosine NLJ)."""
    plain = sources.load(spark, sf_dir, "documents")
    spreaded = sources.load_spread(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if plain.rdd.getNumPartitions() < target:
        assert spreaded.rdd.getNumPartitions() == target
    # row identity preserved
    assert spreaded.count() == plain.count()


def test_spread_is_a_noop_when_already_parallel(spark, sf_dir):
    """The cluster-safety contract: a frame that already carries
    enough partitions must come back UNCHANGED — no shuffle is ever
    added at scale (a repartition node would show in the plan)."""
    target = spark.sparkContext.defaultParallelism
    wide = sources.load(spark, sf_dir, "documents").repartition(target + 7)
    out = sources.spread(spark, wide)
    assert out.rdd.getNumPartitions() == target + 7
    assert "RoundRobinPartitioning(" + str(target) not in out._jdf.queryExecution().optimizedPlan().toString()
