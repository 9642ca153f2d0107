"""Contract tests for the repo tools that parse other tools' output.

tools/bench_protocol.py extracts the total row from a
tools/bench_vs_duck.py markdown table; if the table format drifts,
the protocol runner must fail loudly, not mis-parse. These tests pin
the extraction against the committed BENCH_COMPARE.md (which IS a
bench_vs_duck output) without spawning any Spark/DuckDB work.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _extract_total(text: str) -> tuple[float, float, float]:
    # keep in lockstep with tools/bench_protocol.py:run_once
    m = re.search(
        r"\*\*total\*\* \| \*\*([\d.]+)\*\* \| \*\*([\d.]+)\*\* \| \*\*([\d.]+)\*\*",
        text,
    )
    if not m:
        raise RuntimeError("no total row")
    return tuple(float(g) for g in m.groups())


def test_bench_protocol_regex_matches_source():
    """The regex literal here must be byte-identical to the one in
    tools/bench_protocol.py — the test pins the shared contract."""
    src = (REPO / "tools" / "bench_protocol.py").read_text()
    assert (
        r"\*\*total\*\* \| \*\*([\d.]+)\*\* \| \*\*([\d.]+)\*\* \| \*\*([\d.]+)\*\*"
        in src
    )


def test_bench_protocol_parses_committed_table():
    """BENCH_COMPARE.md is a real bench_vs_duck output; the total row
    must parse and be internally consistent (warm <= cold, duck > 0,
    and the per-query rows must roughly sum to the totals)."""
    body = (REPO / "BENCH_COMPARE.md").read_text()
    cold, warm, duck = _extract_total(body)
    assert 0 < warm <= cold and duck > 0
    # sum only the CURRENT round's table: the file keeps prior rounds'
    # tables as history below the first total row, and their rows must
    # not be charged against this round's totals
    current = body[: body.index("**total**")]
    rows = re.findall(
        r"^\| (?!query|\*\*total)[\w.]+ \| ([\d.]+) \| ([\d.]+) \| ([\d.]+) \|",
        current,
        re.M,
    )
    assert len(rows) >= 50, "58-query basis expected"
    sums = [sum(float(r[i]) for r in rows) for i in range(3)]
    for got, total in zip(sums, (cold, warm, duck)):
        assert got == pytest.approx(total, rel=0.02)
    assert "| query |" in body  # table-splice anchor used by the tool
