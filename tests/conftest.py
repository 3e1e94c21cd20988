from __future__ import annotations

import pytest

from rdfrules_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 12g: the full suite shares ONE session across ~270 tests whose
    # localCheckpoints accumulate until GC; 8g has been seen to hit
    # UNABLE_TO_ACQUIRE_MEMORY under host contention
    s = get_spark(
        "rdfrules-spark-tests", master="local[4]", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
