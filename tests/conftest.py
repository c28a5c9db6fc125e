from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from triple_accel_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()
