"""Map the driver's TPC-H-ish fixture tables onto the reference's retail
logical schema (FIXTURES.md §3).

The reference extracts six retail tables from PostgreSQL
(reference scripts/extract.py:93-114); our engine reads the parquet
fixtures and presents the same logical shapes:

- sale_transactions (fact)  <- lineitem JOIN orders
- customers (dim)           <- customer
- products (dim)            <- part
- stores (tiny dim)         <- supplier

Each builder has a matching DuckDB CTE fragment (``ORACLE_CTES``) used
by the correctness oracles — the Spark plan and the SQL are maintained
side-by-side so they can't drift.

Scale notes:
- lineitem JOIN orders on the order key is the one genuinely large join
  in the pipeline.  Both sides arrive hash-partitionable on the key; at
  100 TB this is a shuffle (sort-merge) join and AQE's skew-join handles
  hot order keys.  We do NOT broadcast orders (it scales with the fact
  table).  Dimension joins downstream (customers/products/stores) are
  broadcast — see plans/gold.py.
- All column derivations are native Spark expressions (no UDFs), so the
  whole view stays inside WholeStageCodegen and Parquet scans prune to
  exactly the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _p(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def sale_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retail fact table (reference sale_transactions, ~1M+ rows in
    source per dags/etl_retail_pipeline - Copy.txt)."""
    li = spark.read.parquet(_p(sf_dir, "lineitem"))
    orders = spark.read.parquet(_p(sf_dir, "orders")).select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_orderkey") * F.lit(10) + F.col("l_linenumber"))
            .cast("long")
            .alias("transaction_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
            F.col("l_suppkey").alias("store_id"),
            F.col("l_quantity").cast("long").alias("quantity"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
            F.col("l_shipdate").alias("order_date"),
        )
    )


def customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension (reference customers, scripts/glue_registry.py:100-110)."""
    return spark.read.parquet(_p(sf_dir, "customer")).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").cast("long").alias("nation_id"),
        F.col("c_acctbal").alias("account_balance"),
        F.col("c_mktsegment").alias("market_segment"),
    )


def products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product dimension (reference products, scripts/glue_registry.py:113-123).
    ``category`` maps to p_brand (low-cardinality GROUP BY key)."""
    return spark.read.parquet(_p(sf_dir, "part")).select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("category"),
        F.col("p_type").alias("product_type"),
        F.col("p_size").cast("long").alias("product_size"),
        F.col("p_retailprice").alias("price"),
    )


def stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store dimension (reference stores, ~5 rows)."""
    return spark.read.parquet(_p(sf_dir, "supplier")).select(
        F.col("s_suppkey").alias("store_id"),
        F.col("s_name").alias("store_name"),
        F.col("s_nationkey").cast("long").alias("nation_id"),
        F.col("s_acctbal").alias("account_balance"),
    )


# DuckDB CTE fragments mirroring the builders above, used to prefix the
# oracle SQL of every retail-surface query.  Keep in lockstep with the
# Spark code — column names and types must match exactly.
ORACLE_CTES = """
sale_transactions AS (
    SELECT CAST(l.l_orderkey * 10 + l.l_linenumber AS BIGINT) AS transaction_id,
           o.o_custkey                                        AS customer_id,
           l.l_partkey                                        AS product_id,
           l.l_suppkey                                        AS store_id,
           CAST(l.l_quantity AS BIGINT)                       AS quantity,
           l.l_extendedprice / l.l_quantity                   AS unit_price,
           l.l_shipdate                                       AS order_date
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
customers AS (
    SELECT c_custkey                  AS customer_id,
           c_name                     AS customer_name,
           CAST(c_nationkey AS BIGINT) AS nation_id,
           c_acctbal                  AS account_balance,
           c_mktsegment               AS market_segment
    FROM customer
),
products AS (
    SELECT p_partkey               AS product_id,
           p_name                  AS product_name,
           p_brand                 AS category,
           p_type                  AS product_type,
           CAST(p_size AS BIGINT)  AS product_size,
           p_retailprice           AS price
    FROM part
),
stores AS (
    SELECT s_suppkey                   AS store_id,
           s_name                      AS store_name,
           CAST(s_nationkey AS BIGINT) AS nation_id,
           s_acctbal                   AS account_balance
    FROM supplier
)
"""


def with_retail_ctes(body_sql: str, extra_ctes: str = "") -> str:
    """Wrap an oracle query body with the retail-view CTE prefix.

    ``extra_ctes``: additional ``name AS (...)`` fragments, comma-joined
    after the retail views.
    """
    ctes = ORACLE_CTES.strip()
    if extra_ctes:
        ctes = f"{ctes},\n{extra_ctes.strip()}"
    return f"WITH {ctes}\n{body_sql}"
