from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from deltoid_spark.session import get_spark

    s = get_spark(cores=4, app="deltoid-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
