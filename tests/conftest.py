from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# default smoke scale; override to re-run the whole suite at another SF
# (SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/)
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from skills_vectors_spark.session import get_spark

    s = get_spark("tests", cpus="8")
    yield s
    from skills_vectors_spark import cache

    cache.clear()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# The two documented quality-gate degradation classes (SCALING.md
# "The evaluation gates are live instruments"): at sf0.1 and the 10x
# synthetic tier the dense-shingle corpus breaks simhash precision
# and the near-random vectors break quantized-ANN (pq / ivf_pq)
# recall — honestly, by algorithm weakness, not by bug. Tests that
# pin those gates xfail at the KNOWN-degraded tiers, strictly — an
# unexpected PASS there is an error too, so the gates stay
# falsifiable in both directions. Tiers not on the allowlist (a new
# intermediate SF, or the same data under another directory name) get
# a NON-strict xfail: the gate may legitimately pass there, and that
# must not turn into a hard error.
_KNOWN_DEGRADED = ("sf0.1", "svs_sf1")
_tier = Path(SF_SMOKE).name
DEGRADED_SF = _tier not in ("sf0.001", "sf0.01")
degraded_gate_xfail = pytest.mark.xfail(
    condition=DEGRADED_SF,
    reason="documented adversarial-corpus degradation at this SF "
    "(SCALING.md): simhash precision on dense-shingle corpora "
    "(r11 threshold sweep: no hamming cutoff passes all tiers)",
    strict=_tier in _KNOWN_DEGRADED,
)

# r11: PQ_OVERSHOOT 8 -> 32 graduated the quantized-recall gates at
# sf0.1 (pq 0.455 -> 0.850, ivf_pq 0.535 -> 0.755, every backend past
# its floor, flat cost) — sf0.1 is no longer a degraded tier for the
# PQ family. The 10x word-salad tier still sits below the 0.6 floor
# (0.52/0.50 at overshoot 32): near-random vectors are the documented
# quantization boundary, so svs_sf1 keeps the strict xfail.
quantized_recall_xfail = pytest.mark.xfail(
    condition=_tier not in ("sf0.001", "sf0.01", "sf0.1"),
    reason="quantized-ANN recall below floor on the 10x near-random "
    "corpus (SCALING.md r11 A/B: overshoot 32 gives 0.52/0.50 there)",
    strict=_tier == "svs_sf1",
)
