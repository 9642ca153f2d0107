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
    surface. Round-10 rotation (the r9 verdict's ordered queue): the
    conversion-queue strata — relational.py's 29 rows (theta-range /
    cross-topk / agg_hash / dedup_first load_spread conversions),
    textstats.py's 11 rows (tokenize-class spreads + the last
    unconditional repartitions), scale_twins.py's 5 rows (advisor-r10
    NULL guard) — plus 5 oldest-attestation re-attest slots (r5
    greens in unchanged knn/ann files)."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        "join_theta_range",
        "join_cross_topk",
        "agg_hash",
        "dedup_first",
        "scan_parquet",
        "scan_csv",
        "sink_parquet",
        "sink_overwrite",
        "project_rename",
        "filter_pred",
        "join_inner_hash",
        "join_broadcast",
        "join_left_outer",
        "join_semi",
        "join_anti",
        "agg_distinct",
        "agg_approx_distinct",
        "agg_collect",
        "agg_rollup",
        "agg_cube",
        "agg_gsets",
        "win_rank_topk",
        "win_running",
        "win_lag_lead",
        "win_ntile_cume",
        "sort_limit",
        "set_union",
        "set_intersect",
        "set_except",
        "lang_id",
        "quality_score",
        "token_count",
        "fingerprint_rolling",
        "fingerprint",
        "text_chunk",
        "quality_repetition",
        "scrub_pii",
        "text_stats",
        "diag_skew",
        "diag_partition_stats",
        "anomaly_mad_production",
        "agg_gini_distributed",
        "approx_percentile_production",
        "hll_sketch_production",
        "dedup_ngram_jaccard_production",
        "knn_exact_l2",
        "eval_avgsim",
        "eval_recall",
        "eval_recall_lsh",
        "report_pivot",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
