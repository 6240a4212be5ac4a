"""Sinks: parquet (partitioned), CSV, JSON-lines (SURVEY.md §2 A4).

Partitioned parquet is the engine's canonical "load" leg: partition
columns become directory keys, enabling static + dynamic partition
pruning on downstream reads. Choose partition columns = the common
filter columns, low cardinality (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
