"""Physical-plan inspection utilities — the engine's Catalyst
feedback loop. Used by tests to ASSERT plan shape (broadcasts chosen,
filters pushed to the scan, window top-k rewritten to group limits)
instead of hoping, and by developers via `explain_report`.

The reference has no optimizer to inspect (SURVEY §4 — straight-line
client code); these utilities are how this engine keeps itself honest
about the plans Catalyst actually picks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _strip_cached_subtrees(p: str) -> str:
    """Drop the plan text that does not execute on a steady-state run:

    - under InMemoryTableScan / InMemoryRelation — the cached child
      plan is printed again for EVERY reference to the cache, but it
      executes at most once (cache build); steady-state reads are
      table scans with no child execution;
    - under "== Initial Plan ==" — a finalized AdaptiveSparkPlan
      prints the pre-AQE plan as a second full copy, double-counting
      every Exchange that actually ran once in the Final Plan."""
    tree_chars = set(" :+-*()0123456789")

    def depth(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in tree_chars:
            i += 1
        return i

    out: list[str] = []
    skip_depth: int | None = None
    skip_inclusive = False  # Initial Plan children print at the SAME
    # depth as the marker line, unlike tree children (which indent)
    for line in p.splitlines():
        d = depth(line)
        if skip_depth is not None:
            if d > skip_depth or (skip_inclusive and d >= skip_depth):
                continue
            skip_depth = None
        if "InMemoryTableScan" in line or "InMemoryRelation" in line:
            skip_depth, skip_inclusive = d, False
            continue
        if "== Initial Plan ==" in line:
            skip_depth, skip_inclusive = d, True
            continue
        out.append(line)
    return "\n".join(out)


@dataclass
class PlanFacts:
    has_broadcast: bool
    has_window_group_limit: bool
    pushed_filters: bool
    whole_stage_codegen: bool
    n_exchanges: int
    n_exchanges_live: int  # excludes one-time cache-build subtrees

    @classmethod
    def of(cls, df: DataFrame) -> "PlanFacts":
        p = physical_plan(df)
        fmt = formatted_plan(df)
        return cls(
            has_broadcast="BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p,
            has_window_group_limit="WindowGroupLimit" in p,
            pushed_filters="PushedFilters: [" in fmt and "PushedFilters: []" not in fmt,
            whole_stage_codegen="WholeStageCodegen" in fmt,
            n_exchanges=p.count("Exchange"),
            n_exchanges_live=_strip_cached_subtrees(p).count("Exchange"),
        )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the parquet scan (column pruning
    check): parse ReadSchema out of the formatted plan."""
    import re

    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols.extend(part.split(":")[0].strip() for part in m.group(1).split(",") if part)
    return cols


def explain_report(df: DataFrame) -> str:
    """One-stop plan summary for interactive tuning: the formatted
    plan plus the extracted PlanFacts header."""
    facts = PlanFacts.of(df)
    return (
        f"broadcast={facts.has_broadcast} window_group_limit={facts.has_window_group_limit} "
        f"pushed_filters={facts.pushed_filters} codegen={facts.whole_stage_codegen} "
        f"exchanges={facts.n_exchanges}\n\n{formatted_plan(df)}"
    )
