"""Full driver simulation (the strong form of verification): load
__spark_entry__.py BY PATH from a neutral cwd in this fresh process —
exactly as the grading driver does — then smoke-check entry() and run
every declared query against its DuckDB oracle at sf0.01.

This catches what repo-cwd runs cannot: worker-side import failures
(closures referencing package modules), cwd-relative paths, and
contract drift in entry/queries/oracle_sql.

    python tools/driver_sim.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else None

    os.chdir("/tmp")  # neutral cwd: the import-by-accident killer
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    r1 = mod.entry(spark)
    rows1 = r1.collect()
    r2 = mod.entry(spark)
    assert len(rows1) > 0, "entry must produce rows"
    assert r1.schema == r2.schema, "entry schema must be stable"
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, r2.collect())), (
        "entry must be deterministic"
    )
    print(f"entry ok: {len(rows1)} rows, schema stable, deterministic")

    import duckdb
    import pandas as pd

    qs, oracles = mod.queries(), mod.oracle_sql()
    names = list(qs)[:limit] if limit else list(qs)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_rows_only = n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                n_rows_only += 1
                continue
            ddf = con.execute(oracles[name]).df()
            ok = len(sdf) == len(ddf) and sorted(sdf.columns) == sorted(ddf.columns)
            if ok:
                cols = sorted(sdf.columns)
                a = sdf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
                b = ddf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
                for col in cols:
                    try:
                        pd.testing.assert_series_equal(
                            a[col],
                            b[col].astype(a[col].dtype),
                            check_exact=False,
                            rtol=0,
                            atol=1e-9,
                        )
                    except Exception as exc:
                        ok = False
                        print(f"FAIL {name} col {col}: {str(exc).splitlines()[-1][:140]}")
            else:
                print(
                    f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)} "
                    f"cols s={sorted(sdf.columns)} d={sorted(ddf.columns)}"
                )
            n_pass += ok
            n_fail += not ok
        except Exception as exc:
            n_fail += 1
            print(f"ERR {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:150]}")

    print(f"driver-sim: pass={n_pass} rows_only={n_rows_only} fail={n_fail} / {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
