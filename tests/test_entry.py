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
    surface. Round-6 rotation (the r5 verdict's top ask): queries
    changed in r6 first, then the 16 r1-vintage relational rows, then
    the r3 strata (functions_suite, textstats, scale)."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        # changed in r6 — must re-attest on current code
        "eval_ndcg_mrr",
        "quality_drift_psi",
        "text_pmi_bigrams",
        "anomaly_mad",
        "scan_merge_schema",
        "stream_drift_psi",
        "sink_merge_rows",
        "eval_ab_lift",
        "stream_sink_files",
        "agg_corr_matrix",
        "dedup_url",
        "eval_dedup_compare",
        "agg_percentile",
        "embed_knn_pipeline",
        "mm_image_features",
        "mm_image_resize",
        "mm_audio_features",
        "stream_transform_state",
        "stream_transform_topk",
        "stream_transform_typecounts",
        # the r1 vintage being retired
        "join_theta_range",
        "join_cross_topk",
        "agg_hash",
        "agg_distinct",
        "agg_collect",
        "agg_rollup",
        "agg_cube",
        "agg_gsets",
        "win_rank_topk",
        "win_running",
        "win_ntile_cume",
        "sort_limit",
        "dedup_first",
        "set_union",
        "set_intersect",
        "set_except",
        # r3 strata
        "fn_string",
        "fn_xml",
        "fn_cosine",
        "lang_id",
        "diag_partition_stats",
        "sink_bucketed",
        "rollup_hypertable",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
