import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from verax_spark.session import get_spark

# Fast-iteration default: smoke scale. Override with VERAX_TEST_SF_DIR.
TEST_SF_DIR = os.environ.get("VERAX_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("verax-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
