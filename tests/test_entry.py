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
    queries; that window must hold the least-attested surface (the
    fn_* / textstats / scale / scale2 families) plus the individually
    promoted queries from registry._PROMOTED."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        "fn_string",
        "fn_xml",
        "text_stats",
        "text_chunk",
        "diag_skew",
        "agg_hll_sketch",
        "text_pack_tokens",
        "quality_filter_apply",
        "scan_npy",
        "win_lag_lead",
        "agg_approx_distinct",
        "embed_project_pca",
        "eval_recall_lsh",
        "eval_backend_compare",
        "knn_exact",
        "knn_filtered",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
