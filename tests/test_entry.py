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
    surface. Round-7 rotation (the r6 verdict's ordered queue): new
    and changed-semantics r7 queries first, then the six stale rows
    on edited files, then the promised r3-vintage strata."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        # new in r7 / changed semantics — must attest on current code
        "stream_late_metrics",
        "ts_ewma",
        "agg_moments",
        "agg_gini",
        "text_zipf_slope",
        "mix_epochs",
        "text_ngram_novelty",
        "mm_frame_sample",
        "eval_ndcg_mrr",
        "retention_cohorts",
        "seq_transitions",
        "agg_percentile",
        "sink_merge_rows",
        "stream_sink_files",
        "agg_winsorized_mean",
        # stale rows on edited files (r6 verdict item 4)
        "mm_image_features",
        "mm_audio_features",
        "mm_metadata_stats",
        "mm_arrow_bytes",
        "embed_mock",
        "embed_with_status",
        "embed_provider_switch",
        # the promised r3-vintage queue
        "knn_exact",
        "knn_filtered",
        "eval_backend_compare",
        "diag_skew",
        "sink_json",
        "sink_partitioned",
        "sink_orc",
        "sink_clustered",
        "join_skew_salted",
        "fingerprint",
        "fingerprint_rolling",
        "text_chunk",
        "quality_score",
        "fn_variant",
        "fn_explode",
        "fn_bitwise",
        "fn_map",
        # scale2's r3 stratum
        "join_range_binned",
        "sessionize_batch",
        "agg_minmax_by",
        "agg_hll_sketch",
        "quality_filter_apply",
        "fn_url",
        "sink_zorder",
        "text_pack_tokens",
        "sink_compact",
        "join_fuzzy_blocked",
        "agg_hist",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
