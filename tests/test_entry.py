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
    surface. Round-13 rotation (the r12 verdict's ordered queue):
    every stratum edited this round — ann.py's newly-oracled gate
    rows, the TWS trio (schema change), the inverted-index family
    (cold re-plan), the percentile machinery, scale3.py, the dedup
    oracle promotions (minhash/simhash pair oracles; simhash output
    changed with the cross-engine hash) — then 18 slots of the
    r8-oldest cohort."""
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
        # ann.py stratum (newly-oracled gate rows lead)
        ["ann_lsh", "ann_ivf", "ann_brp_l2", "ann_pq", "ann_ivf_pq",
         "eval_recall_lsh", "eval_backend_compare"]
        # TWS trio (is_nan schema change this round)
        + (["stream_transform_state", "stream_transform_topk",
            "stream_transform_typecounts"] if tws else [])
        # inverted-index family (cold re-plan)
        + ["text_tfidf_sim", "text_bm25_search", "search_hybrid_rrf",
           "quality_perplexity", "quality_entropy", "eval_ndcg_mrr"]
        # percentile machinery (fragment-sum rework)
        + ["agg_percentile", "agg_winsorized_mean"]
        # scale3.py stratum
        + ["join_bloom_prefilter", "graph_pagerank", "agg_heavy_hitters"]
        # r8-oldest cohort refresh
        + ["mm_audio_features", "scan_npy", "ts_gapfill", "eval_ab_lift"]
        # dedup oracle promotions (behavior/oracle changed late r13)
        + ["dedup_minhash", "dedup_simhash", "eval_dedup_compare"]
    ):
        assert must in window, f"{must} fell out of the 50-query sweep window"
