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


@query(
    "mm_resize",
    oracle="""
    SELECT doc_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(64 AS BIGINT) AS resized_bytes,
           CAST(LEAST(OCTET_LENGTH(ENCODE(text)), 64) AS BIGINT)
             AS content_bytes
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage: binary->binary mapInPandas with declared
    schema (deterministic truncate/zero-pad stand-in body; see
    operators/multimodal.py — a real PIL resample slots into the same
    batch loop).

    The binary payload itself can't be hashed cross-engine, so the
    driver-checked projection is the resize CONTRACT: every output is
    exactly width*height bytes (``resized_bytes``), of which the first
    min(|payload|, 64) are source content and the rest zero padding
    (``content_bytes`` counts the bytes before the trailing zero run,
    computed from the resized binary itself — Spark-side only, then
    cross-checked against the source length in the oracle). Byte-for-byte
    payload equality is asserted by
    tests/test_operators.py::test_mm_resize_matches_python.
    """
    d = load_table(spark, sf_dir, "documents")
    resized = resize_payloads(attach_binary_payload(d), width=8, height=8)
    # content_bytes: strip the zero-pad from the resized binary and
    # measure what's left (document text contains no NUL bytes, so the
    # trailing zero run is exactly the padding).
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("resized").cast("long").alias("resized_bytes"),
        # ISO-8859-1 decode is byte<->char 1:1, so CHAR length of the
        # zero-stripped string == BYTE count of the content prefix
        # (octet_length would re-encode to UTF-8 and inflate bytes >127).
        F.length(
            F.regexp_replace(
                F.decode(F.col("resized"), "ISO-8859-1"), "\x00+$", ""
            )
        )
        .cast("long")
        .alias("content_bytes"),
    )


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
