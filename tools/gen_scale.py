"""Generate a synthetic 10x-of-sf0.1 corpus ("sf1-like") for the
flagship operator families, in the same shape/vocabulary style as the
driver testdata: documents (word-salad text with planted near-dup
pairs), embeddings (unit-norm float32 vectors), events (user event
log). Deterministic (seeded). Written to /tmp — never touches
/root/testdata.

    python tools/gen_scale.py [out_dir] [n_docs] [n_vecs] [n_events]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan stream "
    "vector query agg table hash filter customer key group join index page "
    "cache merge shuffle write read block"
).split()

LANGS = ["en", "en", "en", "zh", "de", "fr"]


def gen_documents(out: Path, n_docs: int, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    texts, langs, sources, n_chars = [], [], [], []
    for i in range(n_docs):
        n_words = int(rng.integers(12, 90))
        words = rng.choice(VOCAB, size=n_words)
        texts.append(" ".join(words))
    # plant ~1% near-duplicate pairs: copy an earlier doc and perturb
    # a couple of words (the dedup tiers need true positives)
    n_dups = n_docs // 100
    for k in range(n_dups):
        src = int(rng.integers(0, n_docs - n_dups))
        words = texts[src].split()
        for _ in range(2):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(VOCAB))
        texts[n_docs - n_dups + k] = " ".join(words)
    for t in texts:
        langs.append(LANGS[int(rng.integers(0, len(LANGS)))])
        sources.append(f"src{int(rng.integers(0, 8))}")
        n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        out / "documents.parquet",
    )


def gen_embeddings(out: Path, n_vecs: int, dim: int = 64, seed: int = 43) -> None:
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
            }
        ),
        out / "embeddings.parquet",
    )


def gen_events(out: Path, n_events: int, seed: int = 44) -> None:
    rng = np.random.default_rng(seed)
    n_users = max(100, n_events // 100)
    # anchor at 2024-01-01 UTC so the synthetic tier covers the same
    # date range as the driver testdata — the fixture date constants
    # (scale.PARTITION_DATE, scale2.UPSERT_DATE) must hit real rows
    # here too, or the date-filtered sinks go silently empty at 10x
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, µs
    ts = base_us + np.sort(rng.integers(0, 30 * 86400 * 1_000_000, n_events))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_events), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
                "event_type": pa.array(
                    rng.choice(["view", "click", "purchase", "scroll"], n_events,
                               p=[0.6, 0.25, 0.05, 0.1])
                ),
                "value": pa.array(np.abs(rng.normal(100, 80, n_events))),
                "props": pa.array(['{"k":' + str(int(x)) + "}" for x in rng.integers(0, 9, n_events)]),
            }
        ),
        out / "events.parquet",
    )


def gen_tpch(out: Path, sf_mult: int = 10, seed: int = 45) -> None:
    """sf1-like TPC-H-shaped tables (sf0.1 row counts x `sf_mult`),
    same schemas as the driver testdata. Synthesized, not copied —
    uniform keys preserve the join fan-outs the sf0.1 tier has
    (lineitem:orders 4:1, orders:customer 10:1)."""
    rng = np.random.default_rng(seed)
    n_cust, n_supp = 15_000 * sf_mult, 1_000 * sf_mult
    n_ord, n_li = 150_000 * sf_mult, 600_000 * sf_mult

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(regions, pa.string()),
            }
        ),
        out / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION{i:02d}" for i in range(25)], pa.string()),
                "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
            }
        ),
        out / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer{i}" for i in range(n_cust)], pa.string()),
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
                "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
                "c_mktsegment": pa.array(
                    rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], n_cust)
                ),
            }
        ),
        out / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier{i}" for i in range(n_supp)], pa.string()),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
                "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
            }
        ),
        out / "supplier.parquet",
    )
    n_part = 20_000 * sf_mult
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array([f"Part{i}" for i in range(n_part)], pa.string()),
                "p_brand": pa.array(rng.choice([f"Brand#{i}" for i in range(1, 6)], n_part)),
                "p_type": pa.array(rng.choice(["STEEL", "BRASS", "COPPER", "TIN", "NICKEL"], n_part)),
                "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
                "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
            }
        ),
        out / "part.parquet",
    )
    base_us = 1_600_000_000_000_000
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
                "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord)),
                "o_totalprice": pa.array(np.round(rng.uniform(900, 500000, n_ord), 2)),
                "o_orderdate": pa.array(
                    base_us + rng.integers(0, 7 * 365 * 86400, n_ord) * 1_000_000,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord)),
            }
        ),
        out / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li)),
                "l_partkey": pa.array(rng.integers(0, 20_000 * sf_mult, n_li)),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
                "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
                "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
                "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
                "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
                "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
                "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
                "l_shipdate": pa.array(
                    base_us + rng.integers(0, 7 * 365 * 86400, n_li) * 1_000_000,
                    pa.timestamp("us"),
                ),
            }
        ),
        out / "lineitem.parquet",
    )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/svs_sf1")
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    n_events = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000
    out.mkdir(parents=True, exist_ok=True)
    gen_documents(out, n_docs)
    gen_embeddings(out, n_vecs)
    gen_events(out, n_events)
    gen_tpch(out, 10)
    print(
        f"wrote {out}: documents={n_docs} embeddings={n_vecs} events={n_events} "
        "tpch=sf0.1x10"
    )


if __name__ == "__main__":
    main()
