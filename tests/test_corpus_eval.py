"""Round-6 corpus-eval wave: ranking-metric invariants, PSI
non-negativity/bucket-spine shape, PMI ordering/support-floor
contracts, and plan-shape checks (the PSI scan must stay a two-
exchange codegen plan; PMI's bigram arm must never leave the JVM).
Cross-engine value parity is the driver's oracle check; these tests
pin the mathematical invariants that hold at ANY tier.
"""

from __future__ import annotations

import math

from skills_vectors_spark.operators import corpus_eval
from skills_vectors_spark.operators.relevance import N_Q_DOCS, TOPK
from skills_vectors_spark.plans import PlanFacts, physical_plan


# ------------------------------------------------ eval_ndcg_mrr

def test_ndcg_mrr_invariants(spark, sf_dir):
    rows = corpus_eval.eval_ndcg_mrr(spark, sf_dir).collect()
    assert len(rows) == N_Q_DOCS
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0, r
        assert 0 <= r.n_hits <= TOPK, r
        if r.n_hits > 0:
            # first hit is at some position 1..K
            assert 1.0 / TOPK - 1e-9 <= r.mrr <= 1.0 + 1e-9, r
        else:
            assert r.mrr == 0.0, r
        # a query with zero hits has zero gain
        if r.n_hits == 0:
            assert r.ndcg == 0.0, r


def test_ndcg_idcg_constant_matches_definition():
    expect = sum((TOPK + 1 - i) / math.log2(i + 1) for i in range(1, TOPK + 1))
    assert corpus_eval.IDCG_AT_K == expect


def test_ndcg_overlap_retrieval_finds_signal(spark, sf_dir):
    # the lexical-overlap candidate tier must beat random: across all
    # queries it should surface at least one gold document somewhere
    rows = corpus_eval.eval_ndcg_mrr(spark, sf_dir).collect()
    assert sum(r.n_hits for r in rows) > 0


# ------------------------------------------------ quality_drift_psi

def test_psi_bucket_spine_and_totals(spark, sf_dir):
    rows = sorted(
        corpus_eval.quality_drift_psi(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(corpus_eval.PSI_BUCKETS))
    # every PSI term is non-negative: (pa-pb)*ln(pa/pb) >= 0 always
    for r in rows:
        assert r.psi_term >= -1e-6, r
        assert 0.0 < r.pa < 1.0 and 0.0 < r.pb < 1.0, r
    # single shared total on every row, equal to the term sum
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1
    assert abs(sum(r.psi_term for r in rows) - rows[0].psi_total) < 1e-4


def test_psi_counts_cover_the_corpus(spark, sf_dir):
    from skills_vectors_spark import sources

    rows = corpus_eval.quality_drift_psi(spark, sf_dir).collect()
    n_docs = sources.load(spark, sf_dir, "documents").count()
    assert sum(r.n_a + r.n_b for r in rows) == n_docs


def test_psi_plan_is_two_exchange_codegen(spark, sf_dir):
    df = corpus_eval.quality_drift_psi(spark, sf_dir)
    p = physical_plan(df)
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    facts = PlanFacts.of(df)
    # bucket agg exchange + the 10-row spine join/window machinery;
    # nothing that scales with the corpus shuffles more than once
    assert facts.n_exchanges_live <= 4, facts.n_exchanges_live
    assert facts.has_broadcast  # counts broadcast into the spine


# ------------------------------------------------ text_pmi_bigrams

def test_pmi_ordering_and_support_floor(spark, sf_dir):
    rows = corpus_eval.text_pmi_bigrams(spark, sf_dir).collect()
    assert 0 < len(rows) <= corpus_eval.PMI_TOPN
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.cnt_ab >= corpus_eval.PMI_MIN_COUNT, r
        assert r.w1 and r.w2, r
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_bigram_arm_stays_jvm_side(spark, sf_dir):
    # the bigram extraction (slice+zip+explode) must be pure codegen;
    # the only Python stage allowed anywhere is the shared _term_freqs
    # cache build (unigram side), which the live plan reads as an
    # InMemoryRelation after first use
    from skills_vectors_spark.plans import _strip_cached_subtrees

    df = corpus_eval.text_pmi_bigrams(spark, sf_dir)
    df.count()  # materialize the shared tf cache
    live = _strip_cached_subtrees(physical_plan(df))
    assert "BatchEvalPython" not in live
    assert "MapInPandas" not in live


def test_pmi_value_definition_on_counts(spark, sf_dir):
    # recompute pmi for the top row from raw corpus counts
    import re
    from collections import Counter

    from skills_vectors_spark import sources

    texts = [
        r.text
        for r in sources.load(spark, sf_dir, "documents").select("text").collect()
        if r.text is not None
    ]
    ws = re.compile(r"\s+", re.ASCII)
    uni: Counter = Counter()
    bi: Counter = Counter()
    n_bi = 0
    for t in texts:
        toks = ws.sub(" ", t.lower()).strip(" ").split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        n_bi += max(0, len(toks) - 1)
    n_uni = sum(uni.values())
    top = corpus_eval.text_pmi_bigrams(spark, sf_dir).collect()[0]
    expect = math.log(
        (bi[(top.w1, top.w2)] / n_bi)
        / ((uni[top.w1] / n_uni) * (uni[top.w2] / n_uni))
    )
    assert abs(top.pmi - expect) < 1e-5
    assert top.cnt_ab == bi[(top.w1, top.w2)]


# ------------------------------------------------ stream_drift_psi

def test_stream_drift_psi_equals_batch(spark, sf_dir):
    batch = sorted(
        corpus_eval.quality_drift_psi(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    streamed = sorted(
        corpus_eval.stream_drift_psi(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    # micro-batch-merged counts through the shared post-processing
    # must equal the one-shot batch computation cell for cell
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stream_drift_psi_restores_shuffle_conf(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    corpus_eval.stream_drift_psi(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


# ------------------------------------------------ stream_sink_files

def test_stream_sink_files_commit_and_watermark_boundary(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from skills_vectors_spark import sources
    from skills_vectors_spark.scratch import scratch
    from skills_vectors_spark.streaming.windows import stream_sink_files

    out_rows = stream_sink_files(spark, sf_dir).collect()
    assert out_rows
    # exactly-once file commit: the sink wrote a transactional
    # manifest (_spark_metadata), not bare files
    assert os.path.isdir(os.path.join(scratch(sf_dir, "stream_sink_out"), "_spark_metadata"))
    # watermark-close boundary: every emitted window ended at least
    # one hour (the delay) before the max event time, and the open
    # tail is absent
    mx = (
        sources.load(spark, sf_dir, "events")
        .agg(F.max(F.col("ts").cast("timestamp")).alias("mx"))
        .collect()[0]
        .mx
    )
    import datetime

    for r in out_rows:
        assert r.window_start + datetime.timedelta(hours=2) <= mx + datetime.timedelta(hours=1)
        assert r.n > 0
    starts = [r.window_start for r in out_rows]
    assert len(starts) == len(set(starts))  # append mode: one emit per window


def test_stream_sink_files_exact_hour_boundary(spark, tmp_path):
    """Pin the eviction boundary (advisor r6): with max event time
    EXACTLY on a window end (13:00), the final watermark is 12:00 and
    the [11:00, 12:00) window sits exactly at window_end == watermark.
    The oracle keeps windows with end <= max(ts) - 1h (inclusive), so
    Spark's append-mode file sink must emit that boundary window too
    — this test fails if Spark's measured eviction predicate is ever
    strict and the oracle needs to follow."""
    import datetime

    from pyspark.sql import functions as F

    from skills_vectors_spark.streaming.windows import stream_sink_files

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    eid = 0
    for minutes in (15, 45, 75, 105, 140, 170):  # 10:15..12:50
        eid += 1
        rows.append((eid, base + datetime.timedelta(minutes=minutes), 1, "click", 1.0, "{}"))
    rows.append((99, base + datetime.timedelta(hours=3), 1, "click", 1.0, "{}"))  # 13:00 sharp
    # one literal file named events.parquet (the source's glob filter
    # matches leaf file names, not Spark-written directories)
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "boundary_sf")
    (tmp_path / "boundary_sf").mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, sf_dir + "/events.parquet")
    got = {r.window_start: r.n for r in stream_sink_files(spark, sf_dir).collect()}
    wm = base + datetime.timedelta(hours=2)  # max(13:00) - 1h delay
    # oracle predicate, inclusively: every window whose end <= wm
    expected = {
        base: 2,  # [10:00, 11:00)
        base + datetime.timedelta(hours=1): 2,  # [11:00, 12:00): end == wm exactly
    }
    open_tail = {base + datetime.timedelta(hours=2), base + datetime.timedelta(hours=3)}
    assert got == expected, got
    assert not (set(got) & open_tail)


# ----------------------------------------------- stream_late_metrics

def _write_events_file(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_stream_late_metrics_horizon_boundary(spark, tmp_path):
    """An event EXACTLY at the watermark horizon is not late (strict
    <), one strictly below it is — pinned with a planted stream where
    the replay batch contains both, plus the engine-watermark mirror
    cross-check implicitly passing (a drift would raise)."""
    import datetime

    from skills_vectors_spark.streaming.windows import stream_late_metrics

    base = datetime.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 1.0, "{}"),  # strictly below horizon -> late on replay
        (2, base + datetime.timedelta(hours=2), 1, "click", 1.0, "{}"),  # == horizon
        (3, base + datetime.timedelta(hours=3), 1, "click", 1.0, "{}"),  # max ts
    ]
    sf_dir = tmp_path / "late_sf"
    sf_dir.mkdir()
    _write_events_file(str(sf_dir / "events.parquet"), rows)
    out = stream_late_metrics(spark, str(sf_dir)).collect()[0]
    assert out.n_input == 6  # both batches fully read
    assert out.n_dropped_late == 1  # only the 10:00 event; 12:00 == horizon stays


def test_stream_late_metrics_matches_progress_feed(spark, sf_dir):
    """End-to-end on the real events table: totals are exactly twice
    the table for input and the closed-horizon count for lateness
    (the oracle's arithmetic, recomputed here independently)."""
    from pyspark.sql import functions as F

    from skills_vectors_spark import sources
    from skills_vectors_spark.streaming.windows import stream_late_metrics

    ev = sources.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    n = ev.count()
    wm = ev.agg(
        F.date_trunc("millisecond", F.max("ts")) - F.expr("INTERVAL 1 HOUR")
    ).collect()[0][0]
    n_late = ev.filter(F.col("ts") < F.lit(wm)).count()
    out = stream_late_metrics(spark, sf_dir).collect()[0]
    assert (out.n_input, out.n_dropped_late) == (2 * n, n_late)


# ------------------------------------------------ text_zipf_slope

def test_zipf_slope_matches_polyfit(spark, sf_dir):
    import numpy as np

    from skills_vectors_spark.operators.corpus_eval import ZIPF_TOPN, text_zipf_slope
    from skills_vectors_spark.operators.relevance import _term_freqs

    freq = (
        _term_freqs(spark, sf_dir)
        .groupBy("tok")
        .sum("tf")
        .withColumnRenamed("sum(tf)", "freq")
        .collect()
    )
    fs = sorted(((r.freq, r.tok) for r in freq), key=lambda t: (-t[0], t[1]))[:ZIPF_TOPN]
    y = np.log(np.array([f for f, _ in fs], dtype=np.float64))
    x = np.log(np.arange(1, len(fs) + 1, dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    got = text_zipf_slope(spark, sf_dir).collect()[0]
    assert got.n_tokens == len(fs)
    assert abs(got.slope - slope) < 1e-5
    assert abs(got.intercept - intercept) < 1e-5
    assert got.slope < 0  # frequencies decay with rank


# ------------------------------------------------ ts_ewma

def test_ts_ewma_matches_reference_fold(spark, sf_dir):
    from skills_vectors_spark import sources
    from skills_vectors_spark.operators.analytics import EWMA_DECAY, EWMA_K, ts_ewma

    ev = sources.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    users = {}
    for r in ev:
        users.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    got = {(r.user_id, r.event_id): r.ewma for r in ts_ewma(spark, sf_dir).collect()}
    assert len(got) == len(ev)
    checked = 0
    for uid, rows in sorted(users.items())[:5]:
        rows.sort()
        vals = [v for _, _, v in rows]
        for t in range(len(vals)):
            window = vals[max(0, t - EWMA_K + 1) : t + 1]
            num = sum(v * EWMA_DECAY ** (len(window) - 1 - i) for i, v in enumerate(window))
            den = (1 - EWMA_DECAY ** len(window)) / (1 - EWMA_DECAY)
            assert abs(got[(uid, rows[t][1])] - num / den) < 1e-5
            checked += 1
    assert checked > 50
