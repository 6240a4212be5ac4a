"""Typed readers for CSV / JSON-lines sources (SURVEY.md §2 A2/A3).

Production rule (SURVEY §1.3): never infer schemas on non-parquet
sources — every reader takes an explicit StructType. Inference requires
an extra full pass over the data and can silently drift types between
runs; at 100 TB both are unacceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    return spark.read.schema(schema).json(path)
