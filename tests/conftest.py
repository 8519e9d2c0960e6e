import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HGS_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("HGS_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from hadoopgis_spark.session import get_spark

    s = get_spark("hgs-tests")
    yield s
