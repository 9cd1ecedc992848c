from __future__ import annotations

import pytest

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "chaos: sampled oracle parity under shuffle.partitions=3 "
        "(select with -m chaos; also part of the default suite)")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fsbd-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_cache_between_tests(request):
    """Query boundary for the shared session: operator-level persists
    (iterative loops, shared shingle/quantized inputs) must not
    accumulate across the 500+-test sweep — the same leak the driver's
    191-query gate would see (see session.release_scoped_cache)."""
    yield
    if "spark" in request.fixturenames:
        release_scoped_cache(request.getfixturevalue("spark"))


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
