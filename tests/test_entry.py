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
    surface. Round-8 rotation (the r7 verdict's ordered queue):
    changed-semantics/first-row queries first, then rows re-staled by
    this round's edits, then the written r8 queue."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        # changed semantics / first rows — must attest on current code
        "agg_gini_distributed",
        "ts_ewma",
        "mix_epochs",
        "text_ngram_novelty",
        "text_tfidf_sim",
        "text_bm25_search",
        "search_hybrid_rrf",
        "quality_perplexity",
        "quality_entropy",
        "stream_late_metrics",
        # re-staled by this round's edits
        "retention_cohorts",
        "seq_transitions",
        "ts_gapfill",
        "anomaly_mad",
        "eval_ab_lift",
        "mm_image_features",
        "mm_audio_features",
        "mm_frame_sample",
        "mm_metadata_stats",
        "mm_arrow_bytes",
        "stream_sink_files",
        # windows.py stream family
        "stream_tumbling",
        "stream_sliding",
        "stream_session",
        "stream_stateful",
        "stream_dedup_late",
        "stream_enrich",
        "stream_join_interval",
        "stream_foreach_batch",
        "stream_transform_state",
        "stream_transform_topk",
        "stream_transform_typecounts",
        # last r3/r4-vintage scale2 rows
        "scan_npy",
        "sink_upsert_partition",
        "mix_corpus",
        "split_train_eval",
        # corpus_eval r6 wave
        "quality_drift_psi",
        "text_pmi_bigrams",
        "stream_drift_psi",
        # scale.py stale rows
        "scan_merge_schema",
        "rollup_hypertable",
        "sink_bucketed",
        # scale3/multimodal2 backlog head
        "scd2_history",
        "text_normalize",
        "dedup_normalized",
        "graph_pagerank",
        "join_bloom_prefilter",
        "agg_heavy_hitters",
        "stream_cms_counters",
        "scan_binaryfile",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
