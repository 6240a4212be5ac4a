"""Source/sink round-trip queries (SURVEY.md §2 A2/A3/A4).

Each query materializes a table through a non-parquet format (or a
partitioned parquet layout) into a scratch dir under the repo, reads it
back with an explicit schema, and returns a result the DuckDB oracle can
reproduce from the original table — proving the extract/load legs are
lossless (types, timestamps, doubles).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import SCHEMAS, load_table
from etl_data_pipeline_spark.functions.canonical import dec_sum
from etl_data_pipeline_spark.plans.registry import query
from etl_data_pipeline_spark.sources.readers import read_csv, read_jsonl
from etl_data_pipeline_spark.sources.writers import (
    write_csv,
    write_jsonl,
    write_parquet_partitioned,
)

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch", "io")


def _scratch(sf_dir: str, leaf: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join(_SCRATCH, tag, leaf)


@query(
    "a2_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def a2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: CSV write + read with header and explicit schema.

    Doubles survive because Spark writes shortest-roundtrip decimal reprs;
    the oracle reads the ORIGINAL table, so a hash match proves the CSV
    leg is lossless.
    """
    c = load_table(spark, sf_dir, "customer")
    path = _scratch(sf_dir, "customer_csv")
    write_csv(c, path)
    return read_csv(spark, path, SCHEMAS["customer"]).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "a3_jsonl_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS VARCHAR) AS orderdate_str, o_orderpriority
    FROM orders
    """,
)
def a3_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: JSON-lines write + schema-on-read (timestamps included)."""
    o = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "orders_jsonl")
    write_jsonl(o, path)
    back = read_jsonl(spark, path, SCHEMAS["orders"])
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("string").alias("orderdate_str"),
        "o_orderpriority",
    )


@query(
    "a4_partitioned_write",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: partitioned parquet load leg: write lineitem partitioned by
    l_returnflag (low-cardinality common filter column), read back, agg.

    Downstream reads of one flag prune to one directory (partition
    pruning); at 100 TB this is the difference between scanning 1/3 of
    the table and all of it.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_returnflag", "l_linestatus"
    )
    path = _scratch(sf_dir, "lineitem_part")
    write_parquet_partitioned(li, path, ["l_returnflag"])
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_sum(F.col("l_extendedprice"), 2).alias("total_price"),
    )
