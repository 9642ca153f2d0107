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


@pytest.fixture()
def _clean_view_memo(spark):
    """Drop and evict every view binding this test touched (created OR
    re-pointed), so the next consumer re-binds lazily from a clean
    memo. Saved entries may be bind_view DERIVED frames (not corpus
    tables), so teardown never tries to recreate a view — eviction is
    the only safe restore."""
    saved = dict(sources._VIEW_BOUND)
    yield
    touched = {
        key
        for key in set(sources._VIEW_BOUND) | set(saved)
        if sources._VIEW_BOUND.get(key) != saved.get(key)
    }
    for key in touched:
        spark.catalog.dropTempView(key[1])
        sources._VIEW_BOUND.pop(key, None)


def test_register_views_memo_skips_rebind_same_sf(spark, sf_dir, _clean_view_memo, monkeypatch):
    """Memo-hit contract: a second register_views at the SAME sf_dir
    must not touch the catalog again (the ~100 ms/table round-trip is
    the whole point of the memo — measured 0.6 s of a 0.94 s cold
    SQL-API row, SCALING.md round-9)."""
    sources.register_views(spark, sf_dir, names=("region",))
    calls = []
    monkeypatch.setattr(
        sources, "load", lambda *a, **k: calls.append(a) or (_ for _ in ()).throw(AssertionError("rebound"))
    )
    sources.register_views(spark, sf_dir, names=("region",))
    assert calls == [], "memo hit must skip the catalog round-trip"


def test_register_views_rebinds_on_sf_dir_change(spark, sf_dir, _clean_view_memo):
    """Correctness side of the memo: pointing the same view name at a
    DIFFERENT sf_dir must re-bind, and spark.sql must see the new
    tier's data (stale-view reads are the failure mode the memo must
    never introduce)."""
    other = "/root/testdata/sf0.01"
    if not os.path.isdir(other) or other == sf_dir:
        pytest.skip("needs two distinct sf tiers")
    sources.register_views(spark, sf_dir, names=("orders",))
    n_small = spark.sql("SELECT count(*) AS c FROM orders").collect()[0].c
    sources.register_views(spark, other, names=("orders",))
    n_big = spark.sql("SELECT count(*) AS c FROM orders").collect()[0].c
    assert n_big != n_small, "re-bind must expose the new tier's rows"
    assert n_big == sources.load(spark, other, "orders").count()


def test_bind_view_memo_same_contract(spark, sf_dir, _clean_view_memo):
    """bind_view (derived-frame views) shares the memo: frame_fn runs
    once per (app, name, sf_dir) and again only on sf_dir change."""
    calls = []

    def frame_fn():
        calls.append(1)
        return sources.load(spark, sf_dir, "nation")

    sources.bind_view(spark, "svs_test_bind_memo", sf_dir, frame_fn)
    sources.bind_view(spark, "svs_test_bind_memo", sf_dir, frame_fn)
    assert len(calls) == 1, "memo hit must not re-run frame_fn"
    other = "/root/testdata/sf0.01"
    if os.path.isdir(other) and other != sf_dir:
        sources.bind_view(
            spark, "svs_test_bind_memo", other,
            lambda: sources.load(spark, other, "nation"),
        )
        assert (
            spark.sql("SELECT count(*) AS c FROM svs_test_bind_memo").collect()[0].c
            == sources.load(spark, other, "nation").count()
        )
