"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference retail ETL pipeline
(JamesAdeshina/retail-etl-pipeline-airflow-s3-athena).

The reference is an eager single-node pandas Medallion pipeline
(Bronze CSV -> Silver partitioned Parquet -> Gold business tables ->
Athena SQL analytics).  This package re-expresses the same semantics
as lazy Spark DataFrame plans:

- ``sources``   : readers/writers/catalog (reference scripts/extract.py,
                  transform.py write path, glue_registry.py)
- ``plans``     : silver cleaning, gold builders, analytics SQL, the
                  end-to-end pipeline driver (reference scripts/transform.py,
                  load.py, athena_queries.py, dags/etl_retail_pipeline.py)
- ``functions`` : data-quality checks and vector/text helpers
                  (reference scripts/data_quality.py)
- ``operators`` : scale extensions beyond the reference — dedup,
                  similarity search, text analysis, multimodal plumbing
- ``streaming`` : incremental bronze->silver as Structured Streaming
                  (reference's @daily Airflow schedule, upgraded)

Everything is built on public Apache Spark APIs only.
"""

from retail_etl_pipeline_airflow_s3_athena_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
