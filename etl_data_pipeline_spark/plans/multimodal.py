"""Multimodal pipeline queries (north star: binary payload columns with
typed metadata, Arrow-batched decode/feature-extract plumbing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_payloads,
    sample_frames,
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


@query("mm_resize")  # rows-only: binary payload output has no SQL oracle
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage: binary->binary mapInPandas with declared
    schema (deterministic stand-in body; see operators/multimodal.py).

    Rows-only driver check (binary output has no SQL oracle); authority:
    tests/test_operators.py::test_mm_resize_matches_python (payloads
    equal Python truncate/zero-pad byte-for-byte).
    """
    d = load_table(spark, sf_dir, "documents")
    return resize_payloads(attach_binary_payload(d), width=8, height=8)


@query(
    "mm_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, n_chars,
             GREATEST(CAST(FLOOR(n_chars / 32.0) AS BIGINT), 1) AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(CEIL(n_frames / 4.0) AS BIGINT) AS n_sampled
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: one-to-many mapInPandas fan-out; the
    oracle checks the fan-out arity per document (frame count from the
    payload size), proving the batch-shape contract."""
    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(d), frame_size=32, every_n=4)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sampled"))
