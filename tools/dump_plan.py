"""Dump `.explain("formatted")` for named queries to plans/<dir>/<query>_<tag>.txt.

    python tools/dump_plan.py <out_dir> <tag> <query> [query ...]

Used by the optimization rounds to commit before/after physical-plan
evidence (the judge reads these files against the code and bench).
Queries whose builders run internal actions (iterative algorithms,
streaming drains) still produce a plan for the RETURNED frame — the
part a downstream consumer would execute.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skills_vectors_spark import registry
from skills_vectors_spark.session import get_spark

registry.load_all()


def main() -> None:
    out_dir, tag = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            txt = f"(no static plan: {type(exc).__name__}: {exc})\n"
        p = out_dir / f"{name}_{tag}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
