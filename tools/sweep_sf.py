"""Robustness sweep: execute EVERY registered query at a given scale
factor through the noop sink, timing each and catching failures.

Unlike bench.py (headline subset, min-of-two), this is a coverage run:
one pass over the full inventory to prove each operator survives the
larger SF (memory, skew, state size), with per-query wall time so
outliers stand out.

    python tools/sweep_sf.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skills_vectors_spark import registry
from skills_vectors_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a] or sorted(registry.QUERIES)
    spark = get_spark("sweep_sf")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            print(f"{name}: {timings[name]}s", flush=True)
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(limit=3)
            print(f"{name}: FAIL {type(exc).__name__}", flush=True)

    slow = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_ok": len(timings),
                "n_fail": len(failures),
                "total_sec": round(sum(timings.values()), 2),
                "slowest": slow,
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    registry.load_all()
    main()
