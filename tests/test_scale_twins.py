"""Production-twin attestation-arm edge cases (operators/scale_twins.py)."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def _plant_events(rows):
    """Write a minimal events.parquet (engine schema) into a temp dir."""
    d = tempfile.mkdtemp(prefix="svs_twin_events_")
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [1700000000000000 + i for i in range(len(rows))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_anomaly_mad_production_all_null_user_gates_true(spark):
    """A user whose values are ALL NULL must not kill the driver row:
    collect_list drops NULLs, so the sorted-value array is empty and
    the old order-statistic gate hit element_at(sv, 0) — a runtime
    error (Spark arrays are 1-indexed). The guard emits TRUE for such
    users, matching the oracle's unconditional TRUE (advisor r10);
    partial-NULL and no-NULL users keep the real bounds check."""
    from skills_vectors_spark.operators.scale_twins import anomaly_mad_production

    d = _plant_events(
        [
            # user 1: all NULL values (the crashing edge)
            (1, 1, None),
            (2, 1, None),
            # user 2: partial NULL
            (3, 2, 10.0),
            (4, 2, None),
            (5, 2, 30.0),
            # user 3: dense
            (6, 3, 1.0),
            (7, 3, 2.0),
            (8, 3, 100.0),
        ]
    )
    out = {r.user_id: r for r in anomaly_mad_production(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    # oracle side counts count(*) per user including NULL-value rows
    assert out[1].n_events == 2
    assert out[2].n_events == 3
    assert out[3].n_events == 3
    for uid in (1, 2, 3):
        assert out[uid].med_in_bounds is True, uid
        assert out[uid].mad_in_bounds is True, uid
