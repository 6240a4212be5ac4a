"""Multimodal column operators (north star: image/audio/video as opaque
binary columns with typed metadata).

The decoders are REAL parsers for the public formats that need no
external libraries: PNM images (PPM P6 / PGM P5 — header parse + numpy
reshape), RIFF WAV PCM16 (chunk walk + frombuffer), and Y4M video
(stream header + FRAME markers). Formats that genuinely require
PIL/soundfile/pyav (JPEG/PNG/MP3/MP4 — absent in this container) raise
``NotImplementedError`` via magic-byte dispatch instead of mis-parsing.
The Spark-side plumbing is shared and tested: binary payload columns, a
typed metadata struct, Arrow-batched ``mapInPandas`` with declared
output schemas, partition-preserving (or declared one-to-many) batch
shapes.

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


def _read_pnm_header(payload: bytes) -> tuple[bytes, list[int], int]:
    """Parse a PNM (PPM/PGM) header: magic, then 3 ASCII ints (width,
    height, maxval) separated by whitespace, with '#' comments allowed.
    Returns (magic, [w, h, maxval], data_offset)."""
    magic = payload[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError(f"malformed PNM header at byte {pos}")
        vals.append(int(payload[start:pos]))
    return magic, vals, pos + 1  # single whitespace after maxval


def decode_image(payload: bytes) -> "object":
    """REAL image decode for the PNM family (PPM 'P6' RGB, PGM 'P5'
    gray) — a pure header-parse + numpy reshape, no external libs.
    Returns a numpy uint8 array of shape (h, w, 3) or (h, w).

    JPEG/PNG need PIL/opencv (absent in this container) and raise: the
    dispatch is by magic bytes, so real files of those formats fail
    loudly instead of mis-parsing.
    """
    import numpy as np

    if payload[:2] in (b"P6", b"P5"):
        magic, (w, h, maxval), off = _read_pnm_header(payload)
        if maxval > 255:
            raise ValueError("16-bit PNM not supported")
        ch = 3 if magic == b"P6" else 1
        n = w * h * ch
        px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
        return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "JPEG/PNG decode requires PIL/opencv (not installed in this "
            "container); PNM (PPM/PGM) decodes natively"
        )
    raise ValueError(f"unrecognized image magic {payload[:4]!r}")


def decode_audio(payload: bytes) -> "tuple":
    """REAL audio decode for WAV (RIFF little-endian, PCM16) — pure
    struct parse of the chunk list + numpy frombuffer, no external libs.
    Returns (sample_rate, channels, samples) with samples int16 of shape
    (n,) mono or (n, channels).

    Compressed codecs (MP3/OGG/FLAC) need soundfile/librosa and raise.
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        if payload[:3] == b"ID3" or payload[:2] == b"\xff\xfb":
            raise NotImplementedError(
                "MP3 decode requires soundfile/librosa (not installed); "
                "WAV PCM decodes natively"
            )
        raise ValueError(f"unrecognized audio magic {payload[:4]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAV is supported")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape((-1, channels))
    return sample_rate, channels, samples


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list":
    """REAL video frame sampling for Y4M (YUV4MPEG2) — plain-text stream
    header, then 'FRAME\\n' + raw planar YUV per frame; pure parse, no
    external libs. Returns every Nth frame as a numpy uint8 array of the
    Y plane, shape (h, w).

    Container formats (MP4/MKV/AVI) need pyav/opencv and raise.
    """
    import numpy as np

    if payload[:9] != b"YUV4MPEG2":
        if payload[4:8] == b"ftyp" or payload[:4] == b"\x1aE\xdf\xa3":
            raise NotImplementedError(
                "MP4/MKV decode requires pyav/opencv (not installed); "
                "Y4M decodes natively"
            )
        raise ValueError(f"unrecognized video magic {payload[:9]!r}")
    nl = payload.index(b"\n")
    w = h = 0
    colorspace = "420"
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:].decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("420"):  # C420 / C420jpeg / C420mpeg2 ...
        frame_bytes = w * h * 3 // 2
    elif colorspace.startswith("422"):
        frame_bytes = w * h * 2
    elif colorspace.startswith("444"):
        frame_bytes = w * h * 3
    elif colorspace == "mono":
        frame_bytes = w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    frames, pos, idx = [], nl + 1, 0
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # FRAME line (may carry params)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        body = payload[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated frame")
        if idx % every_n == 0:
            y = np.frombuffer(body, dtype=np.uint8, count=w * h)
            frames.append(y.reshape((h, w)))
        idx += 1
        pos = fnl + 1 + frame_bytes
    return frames


# ---------------------------------------------------------------------------
# Encoders (the write side of the same formats) — used by the decode
# roundtrip queries to synthesize deterministic payloads from the text
# corpus, since the test tables carry no real media. The DECODERS above
# are the component under test; they parse the public on-disk formats.
# ---------------------------------------------------------------------------


def encode_ppm(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB bytes (len == w*h*3, cycled/truncated) as PPM P6."""
    n = width * height * 3
    body = (pixels * (n // max(len(pixels), 1) + 1))[:n] if pixels else b"\x00" * n
    return b"P6\n%d %d\n255\n" % (width, height) + body


def encode_wav(samples: "object", sample_rate: int = 8000) -> bytes:
    """Encode a mono int16 numpy array as a PCM16 WAV file."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_y4m(
    frames_y: "list", width: int, height: int
) -> bytes:
    """Encode a list of (h, w) uint8 Y planes as Y4M mono."""
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 Cmono\n" % (width, height)
    for y in frames_y:
        out += b"FRAME\n" + y.astype("uint8").tobytes()
    return out


# ---------------------------------------------------------------------------
# Decode roundtrip stages: synthesize a deterministic payload per document
# (the corpus carries no real media), push it through the REAL format
# decoder, and emit SQL-checkable stats. Arrow-batched mapInPandas keeps
# the encode+decode in one Python hop with no shuffle.
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_pixels long, first_r long"
)
AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate long, channels long, n_samples long, "
    "first_sample long, last_sample long"
)
VIDEO_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_frames long, n_sampled long, "
    "first_y long"
)


def decode_image_stats(docs: DataFrame, width: int = 16, height: int = 4) -> DataFrame:
    """PPM roundtrip: text bytes (cycled) -> encode_ppm -> decode_image
    (real P6 parse) -> pixel-array stats."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_image(
                    encode_ppm(text.encode("utf-8"), width, height)
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_pixels": img.shape[0] * img.shape[1],
                        "first_r": int(img[0, 0, 0]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_pixels", "first_r"]
            )

    return docs.select("doc_id", "text").mapInPandas(gen, IMAGE_STATS_SCHEMA)


def decode_audio_stats(docs: DataFrame, cap: int = 128) -> DataFrame:
    """WAV roundtrip: deterministic int16 signal from (doc_id, i) ->
    encode_wav -> decode_audio (real RIFF/PCM16 parse) -> sample stats."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n = max(1, min(int(n_chars), cap))
                i = np.arange(n, dtype=np.int64)
                sig = ((int(doc_id) * 7919 + i * 31) % 20001 - 10000).astype(
                    np.int16
                )
                rate, channels, samples = decode_audio(encode_wav(sig, 8000))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": rate,
                        "channels": channels,
                        "n_samples": len(samples),
                        "first_sample": int(samples[0]),
                        "last_sample": int(samples[-1]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "n_samples",
                    "first_sample", "last_sample",
                ],
            )

    return docs.select("doc_id", "n_chars").mapInPandas(gen, AUDIO_STATS_SCHEMA)


def decode_video_stats(
    docs: DataFrame, width: int = 8, height: int = 8, every_n: int = 2,
    max_frames: int = 5,
) -> DataFrame:
    """Y4M roundtrip: text bytes -> per-frame Y planes -> encode_y4m ->
    sample_video_frames (real YUV4MPEG2 parse, every Nth frame)."""
    import numpy as np

    fb = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                n_frames = max(1, min(len(b) // fb, max_frames))
                planes = []
                for f in range(n_frames):
                    if b:
                        idx = (np.arange(f * fb, (f + 1) * fb)) % len(b)
                        y = np.frombuffer(b, dtype=np.uint8)[idx]
                    else:
                        y = np.zeros(fb, dtype=np.uint8)
                    planes.append(y.reshape((height, width)))
                sampled = sample_video_frames(
                    encode_y4m(planes, width, height), every_n=every_n
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": sampled[0].shape[1],
                        "height": sampled[0].shape[0],
                        "n_frames": n_frames,
                        "n_sampled": len(sampled),
                        "first_y": int(sampled[0][0, 0]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "n_sampled",
                    "first_y",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(gen, VIDEO_STATS_SCHEMA)


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


AUDIO_ENERGY_SCHEMA = (
    "doc_id long, n_samples long, sum_abs long, energy long, "
    "peak long, zero_cross long"
)


def audio_energy_features(docs: DataFrame, cap: int = 128) -> DataFrame:
    """Feature extraction over DECODED audio: synthesize the per-doc WAV,
    run the real RIFF/PCM16 parse, then compute signal features from the
    sample array — total magnitude, energy (sum of squares), peak, and
    zero-crossing count (sign flips between adjacent samples). All exact
    int64 (samples widen from int16 BEFORE squaring).

    This is the plumbing a real audio-curation pass needs (silence /
    clipping / noisiness screens); per-row work is bounded by the sample
    cap, Arrow-batched via mapInPandas.
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n = max(1, min(int(n_chars), cap))
                i = np.arange(n, dtype=np.int64)
                sig = ((int(doc_id) * 7919 + i * 31) % 20001 - 10000).astype(
                    np.int16
                )
                _, _, samples = decode_audio(encode_wav(sig, 8000))
                s = samples.astype(np.int64)
                neg = s < 0
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": len(s),
                        "sum_abs": int(np.abs(s).sum()),
                        "energy": int((s * s).sum()),
                        "peak": int(np.abs(s).max()),
                        "zero_cross": int((neg[1:] != neg[:-1]).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sum_abs", "energy", "peak",
                    "zero_cross",
                ],
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        gen, AUDIO_ENERGY_SCHEMA
    )


IMAGE_HIST_SCHEMA = "doc_id long, bin long, n long"


def image_histogram_features(
    docs: DataFrame, width: int = 16, height: int = 4, n_bins: int = 16
) -> DataFrame:
    """Feature extraction over DECODED images: encode each document's
    bytes as a real PPM, run the actual P6 parse, then bin every RGB
    byte of the decoded pixel array into a 16-bucket intensity
    histogram — the exposure/contrast screen an image-curation pass
    runs (all-dark / all-bright / low-dynamic-range filters). One
    (doc_id, bin, count) row per non-empty bucket, exact integers.
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_bin, out_n = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                img = decode_image(
                    encode_ppm(text.encode("utf-8"), width, height)
                )
                hist = np.bincount(
                    img.reshape(-1) // (256 // n_bins), minlength=n_bins
                )
                for b in np.nonzero(hist)[0]:
                    out_doc.append(int(doc_id))
                    out_bin.append(int(b))
                    out_n.append(int(hist[b]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "bin": out_bin, "n": out_n},
                columns=["doc_id", "bin", "n"],
            ).astype({"doc_id": "int64", "bin": "int64", "n": "int64"})

    return docs.select("doc_id", "text").mapInPandas(gen, IMAGE_HIST_SCHEMA)
