"""Dump PlanFacts + formatted physical plans for every registered
query to stdout (or one query if named) — the .explain feedback loop
over the whole inventory.

    python tools/explain_all.py [sf_dir] [query ...]
    python tools/explain_all.py --markdown [sf_dir]   # SCALE.md table body
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skills_vectors_spark import registry
from skills_vectors_spark.plans import PlanFacts
from skills_vectors_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    markdown = "--markdown" in args
    args = [a for a in args if a != "--markdown"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or sorted(registry.QUERIES)
    registry.load_all()
    spark = get_spark("explain_all", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    if markdown:
        print("| query | exchanges (live) | broadcast | group-limit | pushdown |")
        print("|---|---|---|---|---|")
    for name in names:
        try:
            facts = PlanFacts.of(registry.QUERIES[name](spark, sf_dir))
            if markdown:
                ex = str(facts.n_exchanges_live)
                if facts.n_exchanges != facts.n_exchanges_live:
                    ex += f" ({facts.n_exchanges} incl. cache build)"
                print(
                    f"| {name} | {ex} | {'y' if facts.has_broadcast else ''} "
                    f"| {'y' if facts.has_window_group_limit else ''} "
                    f"| {'y' if facts.pushed_filters else ''} |"
                )
            else:
                print(
                    f"{name}: exchanges={facts.n_exchanges} "
                    f"live={facts.n_exchanges_live} broadcast={facts.has_broadcast} "
                    f"group_limit={facts.has_window_group_limit} pushed={facts.pushed_filters}"
                )
        except Exception as exc:  # streaming queries etc. may not plan statically
            if markdown:
                print(f"| {name} | (no static plan: {type(exc).__name__}) | | | |")
            else:
                print(f"{name}: (no static plan: {type(exc).__name__})")


if __name__ == "__main__":
    registry.load_all()
    main()
