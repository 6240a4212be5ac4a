"""Multimodal pipeline queries (north star: binary payload columns with
typed metadata, Arrow-batched decode/feature-extract plumbing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from etl_data_pipeline_spark.plans.registry import query


@query(
    "mm_features",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS payload_bytes,
           CAST(ASCII(SUBSTR(text, 1, 1)) AS BIGINT) AS first_byte,
           (OCTET_LENGTH(ENCODE(text)) % 251) / 251.0 AS feature
    FROM documents
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: binary payload + metadata struct -> mapInPandas feature
    extraction (deterministic stub decode; real decoders are
    NotImplementedError until the image/audio libs exist — the Spark
    plumbing here is the tested part). The checksum column is excluded
    from the oracle (iterative hash isn't SQL-expressible) and verified
    by the in-repo unit test instead."""
    d = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    return extract_features(mm).select(
        "doc_id", "modality", "payload_bytes", "first_byte", "feature"
    )
