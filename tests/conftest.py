from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_collection_ieee_spark import oracle as orc
from data_collection_ieee_spark import registry
from data_collection_ieee_spark.session import get_spark

SF_DIR = os.environ.get("DCIS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dcis-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = orc.oracle_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session", autouse=True)
def _load_registry():
    registry.load_all()
