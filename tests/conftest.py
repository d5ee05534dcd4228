import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from newspaper_spark.plans.session import get_spark

    s = get_spark(app_name="newspaper-spark-tests", cores=8)
    yield s
    s.stop()


def reference_present() -> bool:
    return os.path.isdir("/root/reference/tests/data")


requires_reference = pytest.mark.skipif(
    not reference_present(), reason="reference fixtures not available"
)
