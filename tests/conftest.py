import os

import pytest

os.environ.setdefault("SPARK_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from mapnik_vector_tile_spark.session import get_spark

    s = get_spark("mvt-tests", cores=4, shuffle_partitions=8)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
