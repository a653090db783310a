from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from stellarsql_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cpus=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
