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
