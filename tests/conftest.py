from __future__ import annotations

import pytest

from roblox_vector_search_datagen_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"

@pytest.fixture(scope="session")
def spark():
    s = get_spark("rvsd-tests", shuffle_partitions=8)
    yield s

@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
