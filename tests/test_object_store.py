"""Object-store sink round-trip (reference scripts/aws_upload.py:6-99)
against a local S3 mock (moto).

The Spark-native path — executors writing ``s3a://`` URIs directly —
needs hadoop-aws + aws-java-sdk jars that this sandbox's pyspark does
not ship (documented environment gate in sources/object_store.py), so
the exercised surface is the boto3 sync module: write a real gold
layer with Spark, upload it, list it, download it, and verify the
parquet round-trips value-identically.
"""

from __future__ import annotations

import pytest

moto = pytest.importorskip("moto")

from retail_etl_pipeline_airflow_s3_athena_spark.plans import (  # noqa: E402
    gold,
    retail_views,
)
from retail_etl_pipeline_airflow_s3_athena_spark.sources import (  # noqa: E402
    object_store,
    writers,
)

BUCKET = "retail-gold-test"


@pytest.fixture()
def s3():
    with moto.mock_aws():
        c = object_store.client()
        object_store.ensure_bucket(c, BUCKET)
        yield c


def test_gold_layer_s3_round_trip(spark, sf_dir, tmp_path, s3):
    st = retail_views.sale_transactions(spark, sf_dir)
    daily = gold.daily_sales_summary(st)
    local = writers.write_gold(daily, str(tmp_path / "gold"), "daily_sales_summary")

    keys = object_store.sync_dir_to_s3(
        s3, local, BUCKET, "gold/daily_sales_summary"
    )
    assert keys, "no files uploaded"
    assert all(k.startswith("gold/daily_sales_summary/") for k in keys)
    assert not any(k.endswith("_SUCCESS") or k.endswith(".crc") for k in keys)
    assert object_store.list_layer(s3, BUCKET, "gold/daily_sales_summary") == keys

    back = tmp_path / "restored"
    files = object_store.download_layer(
        s3, BUCKET, "gold/daily_sales_summary", str(back)
    )
    assert len(files) == len(keys)

    restored = spark.read.parquet(str(back))
    orig = {tuple(r) for r in daily.collect()}
    assert {tuple(r) for r in restored.collect()} == orig


def test_ensure_bucket_idempotent(s3):
    object_store.ensure_bucket(s3, BUCKET)  # second call: no error
    object_store.ensure_bucket(s3, "another-bucket")
    s3.head_bucket(Bucket="another-bucket")


def test_silver_partitions_sync_layout(spark, sf_dir, tmp_path, s3):
    """Partitioned silver layout (date=YYYYMMDD) survives the sync with
    its Hive directory structure intact in the keys."""
    cust = retail_views.customers(spark, sf_dir)
    path = writers.write_silver(
        cust, str(tmp_path / "silver"), "customers", run_date="20260814"
    )
    keys = object_store.sync_dir_to_s3(s3, path, BUCKET, "silver/customers")
    assert keys
    assert all("date=20260814/" in k for k in keys)
