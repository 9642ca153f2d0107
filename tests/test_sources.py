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
