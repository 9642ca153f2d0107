import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


def test_sweep_window_prioritizes_least_attested():
    """Bounded front-to-back sweeps read the first 50 registered
    queries; that window must hold the least-attested-on-current-code
    surface. Round-12 rotation (the r11 verdict's ordered queue): the
    two files edited this round — relational.py's 29 rows (the
    join_cross_topk precision fix + NULL arms) and windows.py's 13
    (the TWS vectorization) — plus the five r7 scale2.py rows
    deferred from the r11 window and 3 oldest-cohort (r8) slots."""
    from skills_vectors_spark import registry
    from skills_vectors_spark.streaming.windows import (
        transform_with_state_available,
    )

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # the stream_transform trio registers only where the TWS runtime
    # is available; elsewhere the window legitimately back-fills from
    # the queue, so only assert set-equality modulo those three
    tws = transform_with_state_available()
    promoted = set(registry._PROMOTED)
    if not tws:
        promoted -= {
            "stream_transform_state",
            "stream_transform_topk",
            "stream_transform_typecounts",
        }
        window = list(registry.QUERIES)[: len(promoted)]
    assert promoted == set(window)
    for must in (
        # relational.py stratum (the edited operator leads)
        ["join_cross_topk", "scan_parquet", "join_theta_range", "agg_hash",
         "win_rank_topk", "sort_limit", "dedup_first", "set_except"]
        # windows.py stratum
        + (["stream_transform_state", "stream_transform_topk",
            "stream_transform_typecounts"] if tws else [])
        + ["stream_tumbling", "stream_foreach_batch", "stream_late_metrics"]
        # deferred r7 scale2.py rows
        + ["quality_filter_apply", "sessionize_batch", "sink_compact",
           "sink_zorder", "text_pack_tokens"]
        # oldest-cohort re-attest slots
        + ["agg_heavy_hitters", "anomaly_mad", "dedup_normalized"]
    ):
        assert must in window, f"{must} fell out of the 50-query sweep window"
