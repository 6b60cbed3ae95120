from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_spark_pspd_spark.session import get_spark
from hadoop_spark_pspd_spark.streaming._protobuf_compat import ensure_protobuf

# must run BEFORE the JVM starts: extends PYTHONPATH so Spark's Python
# workers inherit the protobuf shim (tools/pyshim/sitecustomize.py) that
# transformWithStateInPandas needs on this image
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pspd_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _clear_caches_between_modules():
    """Operators mark shared intermediates with .cache(); the
    verify/bench harnesses clear per query. Mirror that per test module
    so direct operator calls don't accumulate cached DataFrames in
    executor memory across the suite."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()
