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
    surface. Round-4 rotation: all of relational2 (9 queries whose
    only driver row was the r1 events-loader error, plus the three
    rewritten by r3 perf work), relevance (the _term_freqs fusion
    postdates the trio's green rows; search_hybrid_rrf is new), the
    promoted r3 newcomers, then relational backfill."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        # changed in r5 — must re-attest on current code
        "dedup_url",
        "eval_recall_lsh",
        "stream_transform_state",
        "stream_transform_topk",
        "stream_transform_typecounts",
        "retention_cohorts",
        "seq_transitions",
        "ts_gapfill",
        "quality_entropy",
        "graph_pagerank",
        "agg_heavy_hitters",
        "join_bloom_prefilter",
        "scan_binaryfile",
        "agg_percentile",
        # r2-vintage rotation (r4 verdict's top ask)
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_embed_cosine",
        "dedup_apply",
        "dedup_containment",
        "dedup_decontaminate",
        "mm_image_features",
        "mm_arrow_bytes",
        "embed_mock",
        "embed_with_status",
        "embed_provider_switch",
        "knn_exact_l2",
        "eval_avgsim",
        "eval_recall",
        "report_pivot",
        "dedup_embed_cosine_blas",
        "sim_topk_bruteforce",
        "embed_project_pca",
        "stream_tumbling",
        "stream_stateful",
        "stream_join_interval",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
