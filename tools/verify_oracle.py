"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query at a given sf dir on Spark AND its DuckDB
oracle, compares row count + column names/order-insensitive values.
Usage: python tools/verify_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

from skills_vectors_spark import registry
from skills_vectors_spark.session import get_spark
from skills_vectors_spark.sources import TABLES

registry.load_all()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) == len(b):
        for col in a.columns:
            try:
                pd.testing.assert_series_equal(
                    a[col], b[col].astype(a[col].dtype), check_exact=False, rtol=0, atol=1e-9
                )
            except Exception as e:
                problems.append(f"col {col}: {str(e).splitlines()[-1][:200]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(registry.QUERIES)
    spark = get_spark("verify_oracle")
    con = duck_con(sf_dir)
    n_fail = 0
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in registry.ORACLES:
            print(f"ok?  {name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARN {name}: 0 rows")
            continue
        try:
            ddf = con.execute(registry.ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(sdf)} rows ({t_spark:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} ok")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
