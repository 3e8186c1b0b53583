from __future__ import annotations

import pytest

from cie_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="cie_spark_tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
