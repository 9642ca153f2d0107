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
        # relational2: r1 stale-fails + r3-rewritten
        "join_asof",
        "seq_funnel",
        "win_islands",
        "win_range_interval",
        "agg_filtered",
        "agg_mode",
        "fn_try_arith",
        "agg_approx_percentile",
        "sample_stratified",
        "agg_percentile",
        "sql_api_region_revenue",
        "sql_api_topk_revenue",
        # relevance: rewritten trio + newcomer
        "text_tfidf_sim",
        "text_bm25_search",
        "quality_perplexity",
        "search_hybrid_rrf",
        # promoted r3 newcomers
        "mix_corpus",
        "split_train_eval",
        "eval_dedup_compare",
        "stream_foreach_batch",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
