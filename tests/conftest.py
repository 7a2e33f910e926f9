import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from link_profiler_repo_spark.session import get_spark

    # AQE off for tests only: at fixture scale it multiplies job count and
    # driver planning time ~26% with zero benefit (benchmarks keep it on)
    s = get_spark(
        app="tests",
        cores=int(os.environ.get("SPARK_TEST_CPUS", "8")),
        shuffle_partitions=4,
        extra={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
    # no explicit stop(): the gateway JVM dies with the pytest process, and
    # SparkSession.stop() has been observed to stall ~60s at teardown here


@pytest.fixture()
def tmp_workdir(tmp_path):
    return str(tmp_path / "state")
