"""Multimodal column operators (north star: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (``NotImplementedError``) with a deterministic fake
used by tests — but the Spark-side plumbing is real and tested: binary
payload columns, a typed metadata struct, Arrow-batched ``mapInPandas``
feature extraction with a declared output schema, partition-preserving
batch shapes.

At 100 TB: payloads live in parquet binary columns (or object-store URIs
for >2 GB blobs); decode/feature-extract runs as mapInPandas so each
Arrow batch stays columnar across the JVM->Python boundary; partitioning
follows the upstream table (no shuffle introduced by the extract stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: declared schema of the feature-extract stage
FEATURE_SCHEMA = (
    "doc_id long, modality string, payload_bytes long, "
    "first_byte long, checksum long, feature double"
)


def attach_binary_payload(docs: DataFrame, modality: str = "text") -> DataFrame:
    """Model a multimodal table: opaque binary payload + typed metadata.

    (Here the payload is the utf-8 text itself; for real image/audio the
    binary comes straight from the source parquet.)
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.col("n_chars").cast("long").alias("size_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use extract_features(deterministic_stub=True) for plumbing tests"
    )


def decode_audio(payload: bytes) -> "object":
    """Real audio decode — requires soundfile/librosa, absent here."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa (not installed)"
    )


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    """Real video frame sampling — requires pyav/opencv, absent here."""
    raise NotImplementedError("video frame sampling requires pyav/opencv")


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-payload 'decode' is a deterministic stand-in (byte stats +
    a rolling checksum) so the pipeline is testable end-to-end; swap the
    body for a real decoder without touching the Spark plumbing.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload)
                checksum = 0
                for byte in b:
                    checksum = (checksum * 31 + byte) % 1_000_000_007
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "modality": meta["modality"],
                        "payload_bytes": len(b),
                        "first_byte": b[0] if b else -1,
                        "checksum": checksum,
                        "feature": len(b) % 251 / 251.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "modality", "payload_bytes", "first_byte",
                "checksum", "feature",
            ])

    return mm.mapInPandas(gen, schema=FEATURE_SCHEMA)


#: declared schema of the resize stage (payload stays binary)
RESIZE_SCHEMA = "doc_id long, width int, height int, resized binary"

#: declared schema of the frame-sample stage — NOTE one-to-many: a single
#: video row fans out to one row per sampled frame
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_checksum long"


def resize_payloads(mm: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Arrow-batched 'resize': maps each payload to a fixed w*h byte
    buffer (truncate/zero-pad — the deterministic stand-in for a real
    PIL/opencv resample, which would slot into the same batch loop).

    Plumbing that IS real: binary-in/binary-out columns across Arrow,
    declared output schema, row-count-preserving batch shape, no shuffle.
    """
    n = width * height

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)[:n]
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": width,
                        "height": height,
                        "resized": b + b"\x00" * (n - len(b)),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "resized"])

    return mm.mapInPandas(gen, schema=RESIZE_SCHEMA)


def sample_frames(mm: DataFrame, frame_size: int = 32, every_n: int = 4) -> DataFrame:
    """Arrow-batched frame sampling: each payload is treated as a
    sequence of fixed-size 'frames'; every Nth frame is emitted as its
    own output row (one-to-many batch shape — the part a naive UDF can't
    do; mapInPandas output length is free).

    A real decoder (pyav/opencv) replaces the byte-slicing only.
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_size)
                for idx in range(0, n_frames, every_n):
                    fb = b[idx * frame_size : (idx + 1) * frame_size]
                    checksum = 0
                    for byte in fb:
                        checksum = (checksum * 31 + byte) % 1_000_000_007
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_bytes": len(fb),
                            "frame_checksum": checksum,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"],
            )

    return mm.mapInPandas(gen, schema=FRAME_SCHEMA)
