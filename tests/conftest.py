from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tdei_extract_load_service_spark.session import get_spark

    spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark
