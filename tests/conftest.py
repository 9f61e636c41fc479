import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SYNTH_ROOT", "/root/repo/data/synth")


@pytest.fixture(scope="session")
def spark():
    from llm_drift_detector_spark.session import get_spark

    s = get_spark(master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
