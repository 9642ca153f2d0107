from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from skills_vectors_spark.session import get_spark

    s = get_spark("tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
