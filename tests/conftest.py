from __future__ import annotations

import pytest

from rdfrules_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rdfrules-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
