"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` pipelines.

Design (driver north_star): image/audio/video travel as ``binary``
columns next to a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Pandas functions over ``mapInPandas`` so
each task processes Arrow record batches (vectorized transfer, no
per-row pickling). At 100 TB the payload column dominates bytes:
queries that don't touch it must prune it at the parquet scan (keep
payloads in their own parquet column, never inside a struct with hot
metadata), and decode stages should run AFTER filters so only
surviving rows are decoded.

The actual pixel/sample codecs (PIL, ffmpeg, torchaudio) are NOT in
this container, so the decode math is STUBBED: ``decode_image`` falls
back to a deterministic header parse + byte statistics
(``_FAKE_DECODE = True``) and ``resize_image`` raises
``NotImplementedError`` unless PIL is importable. Everything
Spark-side — schemas, UDF signatures, Arrow batch iteration,
partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - PIL is absent in this container
    import PIL.Image  # noqa: F401

    _FAKE_DECODE = False
except ImportError:
    _FAKE_DECODE = True

# Payload header for the synthetic corpus: magic, kind, width, height.
# Kept as (format, size) primitives — struct.Struct objects can't be
# pickled into UDF closures.
_HDR_FMT = "<4sBHH"
_HDR_SIZE = struct.calcsize(_HDR_FMT)
_MAGIC = b"SGMM"
_KINDS = {"image": 1, "audio": 2, "video": 3}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("crc32", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_crc32", T.LongType()),
    ]
)


def make_payload(media_id: int, kind: str, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic fake payload: parseable header + content bytes."""
    body = b"".join(
        hashlib.sha256(f"{media_id}:{i}".encode()).digest()
        for i in range(max(1, n_frames))
    )
    return struct.pack(_HDR_FMT, _MAGIC, _KINDS[kind], width, height) + body


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Build a deterministic media corpus (no external codecs needed)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 16 + (i % 8) * 16, 16 + (i % 5) * 16
        frames = 1 if kind != "video" else 2 + i % 6
        rows.append(
            (
                i,
                kind,
                make_payload(i, kind, w, h, frames),
                (w, h, frames, "fake/v1"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Decode stage over ``mapInPandas`` (Arrow-batched).

    Real codec path would open ``payload`` with PIL; the container has
    no PIL, so the STUB parses the header (width/height) and computes
    byte statistics — deterministic, schema-identical to the real
    path, and enough to test the plumbing end-to-end.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "byte_sum": [],
                "crc32": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if not _FAKE_DECODE:  # pragma: no cover
                    raise NotImplementedError("real codec path needs PIL")
                if b[:4] == _MAGIC:
                    _, _, w, h = struct.unpack(_HDR_FMT, b[:_HDR_SIZE])
                    body = b[_HDR_SIZE:]
                else:  # headerless payload: treat all bytes as body
                    w, h = 0, 0
                    body = b
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["byte_sum"].append(sum(body))
                out["crc32"].append(zlib.crc32(body))
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction stub: payload bytes -> deterministic
    unit-normalized float vector (sha256-expanded). The real path
    would run a vision/audio encoder per Arrow batch (the batch loop
    is exactly where a GPU model call goes)."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = b""
                seed = hashlib.sha256(bytes(payload))
                while len(raw) < 4 * dim:
                    seed.update(b"x")
                    raw += seed.digest()
                v = np.frombuffer(raw[: 4 * dim], dtype=np.uint32).astype(np.float64)
                v = (v / 2**32) * 2.0 - 1.0
                v /= np.linalg.norm(v) or 1.0
                ids.append(mid)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "feature": vecs})

    return df.mapInPandas(feats, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (1-to-many inside ``mapInPandas``). Frames are fixed-size
    32-byte slots in the fake container; the real path would seek with
    a demuxer. Rows multiply inside the task — no shuffle."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_crc32": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                body = b[_HDR_SIZE:] if b[:4] == _MAGIC else b
                n_frames = max(1, len(body) // 32)
                for idx in range(0, n_frames, every_n):
                    frame = body[idx * 32: (idx + 1) * 32]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_crc32"].append(zlib.crc32(frame))
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, FRAMES_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage — requires a real codec; stubbed per contract."""
    if _FAKE_DECODE:
        raise NotImplementedError(
            "resize_image needs PIL (not in this container); the "
            "mapInPandas pipeline shape is identical to decode_image"
        )
    raise NotImplementedError("real resize not implemented")  # pragma: no cover


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat documents.text's UTF-8 bytes as an opaque
    payload — lets the multimodal pipeline run against real testdata
    (and gives the decode stage a DuckDB oracle: byte stats over
    ASCII text are SQL-computable)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
