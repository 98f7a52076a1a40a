from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from retail_etl_pipeline_airflow_s3_athena_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
