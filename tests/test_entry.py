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
    surface. Round-11 rotation (the r10 verdict's ordered queue): the
    four files whose unconditional repartitions were converted this
    round — functions_suite.py's 14 rows (fn_json / fn_string
    load_spread wins + fn_explode), ann.py's 9, knn.py's 6,
    embed.py's 4 — plus 17 oldest-attestation re-attest slots
    (mix_temperature r4, the r6 pair, 14 of the 19 r7 rows)."""
    from skills_vectors_spark import registry

    registry.load_all()
    window = list(registry.QUERIES)[:50]
    for must in [
        "fn_string",
        "fn_json",
        "fn_explode",
        "fn_date",
        "fn_math",
        "fn_array",
        "fn_cosine",
        "fn_l2",
        "fn_map",
        "fn_regex",
        "fn_bitwise",
        "fn_conditional",
        "fn_variant",
        "fn_xml",
        "ann_lsh",
        "ann_ivf",
        "ann_pq",
        "ann_ivf_pq",
        "sink_ann_index",
        "ann_brp_l2",
        "stream_ann_assign",
        "eval_recall_lsh",
        "eval_backend_compare",
        "knn_exact",
        "knn_exact_l2",
        "knn_filtered",
        "eval_recall",
        "eval_avgsim",
        "report_pivot",
        "embed_mock",
        "embed_with_status",
        "embed_knn_pipeline",
        "embed_provider_switch",
        "mix_temperature",
        "dedup_url",
        "mm_image_resize",
        "join_skew_salted",
        "sink_clustered",
        "sink_json",
        "sink_merge_rows",
        "sink_orc",
        "sink_partitioned",
        "eval_ndcg_mrr",
        "text_zipf_slope",
        "agg_hist",
        "agg_hll_sketch",
        "agg_minmax_by",
        "fn_url",
        "join_fuzzy_blocked",
        "join_range_binned",
    ]:
        assert must in window, f"{must} fell out of the 50-query sweep window"
