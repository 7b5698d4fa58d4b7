import sys

sys.path.insert(0, "/root/repo")

import pytest

from cross_modal_multivector_search_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cmms-tests", shuffle_partitions=8)
    yield s
    s.stop()
