import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from pos_dlt_spark.session import get_spark

    # small shuffle-partition count: test data is tiny and 32-way shuffles
    # just add scheduling overhead
    spark = get_spark("pos_dlt_spark_tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def pos_fixtures(tmp_path_factory):
    from pos_dlt_spark.generator import PosFixtures

    root = tmp_path_factory.mktemp("pos_fixtures")
    return PosFixtures(root=str(root)).generate()
