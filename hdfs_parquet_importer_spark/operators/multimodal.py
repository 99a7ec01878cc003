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

Codec status: PNG (grayscale 8-bit), JPEG (baseline DCT grayscale),
and WAV (PCM16) are REAL — PNG chunk parsing with CRC verification,
zlib inflate, and full scanline un-filtering (None/Sub/Up/Average/
Paeth); JPEG with quality-scaled Annex K quantization, standard
Huffman tables, byte stuffing, and restart markers (r11; the decoder
parses whatever DQT/DHT/SOF0/DRI the file carries, so it is not
limited to this encoder's output — progressive/arithmetic/color
streams raise NotImplementedError by name); WAV RIFF parsing with
struct. ``decode_media`` dispatches on the payload magic and returns
decoded pixel/sample statistics; ``resize_image`` does a real
nearest-neighbor resample (decode -> numpy index -> re-encode). Video
is real for MJPEG-in-AVI (r13): ``encode_avi_mjpeg`` /
``decode_avi_mjpeg`` write and parse the RIFF/AVI container (hdrl
stream headers, movi demux, idx1 cross-check) and every frame decodes
through the real baseline-JPEG decoder; non-MJPEG codecs (H.264 etc.,
inter-frame territory) raise ``NotImplementedError`` by name. The
legacy ``SGMM`` fake container is still accepted for plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from functools import lru_cache as _lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

DECODED_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("value_sum", T.LongType()),
        T.StructField("value_min", T.LongType()),
        T.StructField("value_max", T.LongType()),
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
        # Hex of the raw frame bytes — the cross-engine-checkable
        # fingerprint (DuckDB has sha256 but not crc32, and SGMM
        # frame slots ARE sha256 digests, so an oracle can re-derive
        # this column from the generative formula).
        T.StructField("frame_hex", T.StringType()),
    ]
)


# --------------------------------------------------------------------------
# Real PNG codec (grayscale, 8-bit), stdlib-only: zlib + struct.
# Encoder cycles scanline filters None/Sub/Up so round-trips exercise
# more than the trivial filter; decoder implements all five PNG filter
# types and verifies every chunk CRC.
# --------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode row-major 8-bit grayscale pixels as a real PNG."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width: (y + 1) * width]
        ft = y % 3  # cycle None / Sub / Up
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = bytes(
                (line[x] - (line[x - 1] if x else 0)) & 0xFF for x in range(width)
            )
        else:
            filt = bytes((line[x] - prev[x]) & 0xFF for x in range(width))
        raw.append(ft)
        raw.extend(filt)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale 8-bit PNG -> (width, height, pixel bytes).

    Verifies chunk CRCs, inflates IDAT, and reverses all five scanline
    filters (None/Sub/Up/Average/Paeth) per the PNG spec."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, width, height = 8, b"", None, None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        chunk = data[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(tag + chunk) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "only 8-bit non-interlaced grayscale supported "
                    f"(got depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != height * (width + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytes(width)
    p = 0
    for _y in range(height):
        ft = raw[p]
        line = bytearray(raw[p + 1: p + 1 + width])
        p += 1 + width
        if ft == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ft == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(width):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.extend(line)
        prev = bytes(line)
    return width, height, bytes(out)


# --------------------------------------------------------------------------
# Real JPEG codec (baseline DCT, grayscale + 4:4:4 color), stdlib +
# numpy.
#
# Full JFIF pipeline: (for color) BT.601 RGB->YCbCr, then level shift
# -> 8x8 FDCT -> quality-scaled Annex K quantization (luminance table
# for gray/Y, chrominance table for Cb/Cr) -> zigzag -> DC-diff/AC-RLE
# Huffman coding with the Annex K standard tables and 0xFF byte
# stuffing; color scans interleave one block per component per MCU
# with per-component DC predictors. The decoder is GENERIC on the
# format (parses whatever DQT/DHT/SOF0/DRI the file carries, unstuffs,
# handles restart markers, 1 or 3 components at 4:4:4), so it reads
# real-world baseline grayscale AND 4:4:4 color JPEGs, not just this
# encoder's output; progressive (SOF2), arithmetic, lossless,
# subsampled (4:2:0/4:2:2), and partial-scan files raise
# NotImplementedError by name. JPEG is lossy, so unlike the PNG path
# the pixel oracle is an error-bound gate, not byte equality.
# --------------------------------------------------------------------------
_JPEG_STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
# Zigzag scan order: _ZIGZAG[k] = row-major block index of the k-th
# zigzag position.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]
# Annex K.3.3 standard luminance Huffman tables: (BITS counts by code
# length 1..16, HUFFVAL). Round-trip safety does not depend on these
# being the published values (both halves share them via DHT), but
# using the standard tables keeps the output readable by any decoder.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_BITS) == len(_AC_VALS) == 162

# Annex K.1 standard chrominance quantization table and K.3.3 standard
# chrominance Huffman tables — the color (4:4:4) encoder's Cb/Cr
# tables, same public source as the luminance set above.
_JPEG_STD_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical Huffman (BITS, HUFFVAL)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


@_lru_cache(maxsize=None)
def _std_codes() -> tuple[dict, dict]:
    """The (DC, AC) standard-table canonical codes, built once per
    process — encode_jpeg_gray runs per ROW inside mapInPandas, so
    rebuilding these constants per call is pure repeated work
    (r11 review)."""
    return (
        _canonical_codes(_DC_BITS, _DC_VALS),
        _canonical_codes(_AC_BITS, _AC_VALS),
    )


@_lru_cache(maxsize=None)
def _std_chroma_codes() -> tuple[dict, dict]:
    """The (DC, AC) standard CHROMINANCE canonical codes, built once
    per process (same rationale as :func:`_std_codes`)."""
    return (
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )


def _scaled_qt(
    quality: int, base: list[int] | None = None
) -> list[int]:
    """libjpeg quality scaling of an Annex K quantization table
    (default: luminance; pass ``_JPEG_STD_CHROMA_QT`` for Cb/Cr)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [
        min(255, max(1, (q * scale + 50) // 100))
        for q in (base if base is not None else _JPEG_STD_LUMA_QT)
    ]


@_lru_cache(maxsize=None)
def _dct_mat():
    """8x8 orthonormal DCT-II matrix, built once per process (the
    codec runs per row in mapInPandas — r11 review)."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        s = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for n in range(8):
            c[k, n] = s * math.cos(math.pi * (2 * n + 1) * k / 16)
    return c


def _raw_gray(px) -> bytes:
    """Normalize a pixel cell (binary column bytes OR int array
    column) to raw row-major grayscale bytes — one shared coercion for
    every encode stage, so the semantics can't drift apart
    (r11 review: this was copy-pasted in three mapInPandas closures)."""
    if isinstance(px, (bytes, bytearray)):
        return bytes(px)
    return bytes(bytearray(int(v) & 0xFF for v in px))


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            b = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            self.write(0x7F, 8 - self._nbits)  # pad with 1s


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, appended-bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _pad_plane(plane, width: int, height: int):
    """Edge-replicate a (height, width) float plane out to 8-multiple
    dimensions — the shared MCU padding for every encode path."""
    import numpy as np

    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:height, :width] = plane
    padded[height:, :width] = padded[height - 1: height, :width]
    padded[:, width:] = padded[:, width - 1: width]
    return padded


def _encode_block(bw, block, qmat, dc_codes, ac_codes, prev_dc, c):
    """FDCT + quantize + Huffman-code one level-shifted 8x8 block into
    ``bw``; returns the block's quantized DC (the next predictor)."""
    import numpy as np

    coef = c @ block @ c.T
    q = np.round(coef / qmat).astype(np.int64)
    zz = q.reshape(64)[_ZIGZAG]
    # DC
    size, mag = _mag_bits(int(zz[0]) - prev_dc)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(mag, size)
    # AC: (run, size) pairs with ZRL and EOB
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            bw.write(zc, zl)
            run -= 16
        size, mag = _mag_bits(v)
        acode, alen = ac_codes[(run << 4) | size]
        bw.write(acode, alen)
        bw.write(mag, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        bw.write(ec, el)
    return int(zz[0])


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, 2 + len(payload)) + payload


def encode_jpeg_gray(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major 8-bit grayscale pixels as a baseline JFIF JPEG.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the error-resilience / parallel-decode feature real
    encoders use for large images; also what keeps the decoder's
    restart path honestly tested)."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    if width == 0 or height == 0:
        raise ValueError("JPEG cannot encode an empty image")
    qt = _scaled_qt(quality)  # natural (row-major) order
    qmat = np.array(qt, dtype=np.float64).reshape(8, 8)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    padded = _pad_plane(img, width, height)
    ph, pw = padded.shape
    c = _dct_mat()

    dc_codes, ac_codes = _std_codes()
    bw = _BitWriter()
    prev_dc, mcu, rst_n = 0, 0, 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # byte-align (pad with 1s) before the marker
                bw.out += bytes([0xFF, 0xD0 + rst_n % 8])
                rst_n += 1
                prev_dc = 0
            mcu += 1
            prev_dc = _encode_block(
                bw,
                padded[by: by + 8, bx: bx + 8] - 128.0,
                qmat, dc_codes, ac_codes, prev_dc, c,
            )
    bw.flush()

    # DQT entries are serialized in ZIGZAG order per the spec.
    dqt = _jpeg_seg(0xDB, bytes([0]) + bytes(qt[i] for i in _ZIGZAG))
    sof = _jpeg_seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = _jpeg_seg(
        0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    ) + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
        + bytes(bw.out) + b"\xff\xd9"
    )


def encode_jpeg_rgb(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode row-major interleaved 8-bit RGB as a baseline color
    JFIF JPEG (r11 VERDICT item 8 retired the multi-component codec
    boundary at 4:4:4; r12 adds ``subsampling="420"`` — the libjpeg
    default for real-world color files).

    Pipeline: BT.601 full-range RGB -> YCbCr; Y against the Annex K
    luminance tables (DQT slot 0 / DHT class 0), Cb and Cr against
    the Annex K chrominance tables (slot 1 / class 1), each component
    with its own DC predictor; ``restart_interval`` resets all three
    predictors (ITU T.81 F.2.1.3.1). With ``"444"`` every MCU is one
    8x8 block per component; with ``"420"`` chroma is 2x2 box-
    averaged and each 16x16 MCU interleaves four Y blocks (raster
    order, T.81 A.2.3) plus one Cb and one Cr block."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(
            f"subsampling must be '444' or '420', got {subsampling!r}"
        )
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"expected {width * height * 3} RGB bytes, got {len(pixels)}"
        )
    if width == 0 or height == 0:
        raise ValueError("JPEG cannot encode an empty image")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qt_l = _scaled_qt(quality)
    qt_c = _scaled_qt(quality, base=_JPEG_STD_CHROMA_QT)
    qm_l = np.array(qt_l, dtype=np.float64).reshape(8, 8)
    qm_c = np.array(qt_c, dtype=np.float64).reshape(8, 8)
    qmats = (qm_l, qm_c, qm_c)
    dc_l, ac_l = _std_codes()
    dc_c, ac_c = _std_chroma_codes()
    tabs = ((dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c))
    if subsampling == "444":
        samp = ((1, 1), (1, 1), (1, 1))
        planes = [_pad_plane(p, width, height) for p in (y, cb, cr)]
    else:  # 420
        samp = ((2, 2), (1, 1), (1, 1))
        # Pad the full-res planes to 16-multiples FIRST (edge
        # replication), then 2x2 box-average chroma — the padded
        # region averages to the edge value, exactly what the decoder
        # replicates back.
        ph16 = -(-height // 16) * 16
        pw16 = -(-width // 16) * 16

        def pad16(p):
            # _pad_plane pads to 8-multiples; extend to 16-multiples
            # with one more edge-replicate pass when needed.
            pf = _pad_plane(p, width, height)
            if pf.shape != (ph16, pw16):
                big = np.empty((ph16, pw16), dtype=np.float64)
                big[: pf.shape[0], : pf.shape[1]] = pf
                big[pf.shape[0]:, : pf.shape[1]] = pf[-1:, :]
                big[:, pf.shape[1]:] = big[:, pf.shape[1] - 1: pf.shape[1]]
                pf = big
            return pf

        def half(p):
            pf = pad16(p)
            return (
                pf[0::2, 0::2] + pf[1::2, 0::2]
                + pf[0::2, 1::2] + pf[1::2, 1::2]
            ) / 4.0

        planes = [pad16(y), half(cb), half(cr)]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    c = _dct_mat()

    bw = _BitWriter()
    prev, mcu, rst_n = [0, 0, 0], 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n % 8])
                rst_n += 1
                prev = [0, 0, 0]
            mcu += 1
            for ci in range(3):
                hi, vi = samp[ci]
                dc_codes, ac_codes = tabs[ci]
                for blk_r in range(vi):
                    for blk_c in range(hi):
                        py = (my * vi + blk_r) * 8
                        px_ = (mx * hi + blk_c) * 8
                        prev[ci] = _encode_block(
                            bw,
                            planes[ci][py: py + 8, px_: px_ + 8] - 128.0,
                            qmats[ci], dc_codes, ac_codes, prev[ci], c,
                        )
    bw.flush()

    sampling_bytes = [(h << 4) | v for h, v in samp]
    dqt = _jpeg_seg(
        0xDB, bytes([0]) + bytes(qt_l[i] for i in _ZIGZAG)
    ) + _jpeg_seg(0xDB, bytes([1]) + bytes(qt_c[i] for i in _ZIGZAG))
    sof = _jpeg_seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([
            1, sampling_bytes[0], 0,
            2, sampling_bytes[1], 1,
            3, sampling_bytes[2], 1,
        ]),
    )
    dht = (
        _jpeg_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        + _jpeg_seg(
            0xC4,
            bytes([0x01]) + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS),
        )
        + _jpeg_seg(
            0xC4,
            bytes([0x11]) + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS),
        )
    )
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
        + bytes(bw.out) + b"\xff\xd9"
    )

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops AT restart/terminating markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data ended at marker early")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                raise ValueError("JPEG entropy data ended at marker early")
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if not self._nbits:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Consume a restart marker (byte-aligned) and reset state.

        ``self.marker`` is always None on entry: :meth:`_fill` raises
        the moment it hits a marker during bit fill, aborting decode
        before any align call — this restart path alone consumes
        markers (r11 ADVICE removed the unreachable marker-set
        branch)."""
        self._acc = self._nbits = 0
        # Skip stuffed FF00 pairs first: flush padding before the
        # marker can itself be a 0xFF byte, which the entropy
        # coder stuffs — those are unread padding, not the marker.
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        # Marker not yet hit during bit fill: it must be next.
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
        ):
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")
        if self.marker != 0xD0 + (n % 8):
            raise ValueError(
                f"expected RST{n % 8}, got marker {self.marker:#x}"
            )
        self.marker = None



def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _decode_jpeg_planes(data: bytes):
    """Shared baseline-JPEG decode core -> (width, height, planes).

    Parses DQT/DHT/SOF0/SOS/DRI generically, unstuffs 0xFF00, honors
    restart markers, and entropy-decodes an interleaved baseline scan
    of 1 (grayscale) or 3 (color) components with sampling factors
    h, v in {1, 2} — 4:4:4, 4:2:2, 4:4:0, and 4:2:0 (the libjpeg
    default for real-world color files) all decode. Each component
    carries its own quant table, Huffman pair, and DC predictor; an
    MCU holds h_i x v_i blocks per component in raster order (ITU
    T.81 A.2.3), and subsampled chroma planes are upsampled back to
    full resolution by pixel replication before return. Returns the
    IDCT output planes as float arrays cropped to (height, width) —
    the public wrappers (:func:`decode_jpeg_gray`,
    :func:`decode_jpeg_rgb`) own clipping and color conversion.
    Progressive (SOF2) streams dispatch to
    :func:`_decode_jpeg_progressive` (full spectral-selection +
    successive-approximation support, r12 second pass); arithmetic
    coding, lossless, sampling factors above 2, and other unsupported
    shapes raise ``NotImplementedError`` naming the missing piece."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq) SOF order
    scan_ids: list[tuple[int, int]] = []  # (dc_id, ac_id) aligned to comps
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # Any number of 0xFF fill bytes may precede a marker id
        # (ITU T.81 B.1.1.2) — skip them or the real marker bytes
        # get misread as a segment length (r11 review).
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(data):
                raise ValueError("truncated JPEG segment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before any scan — standalone, no length
            raise ValueError("JPEG has no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # Standalone markers — TEM (0x01), stray RSTn (0xD0-D7),
            # repeated SOI (0xD8) — carry NO length field (ITU T.81
            # B.1.1.3); parsing one as length-prefixed would misread
            # the next two payload bytes as a segment length (r11
            # ADVICE).
            pos += 2
            continue
        if marker == 0xC2:
            # Progressive DCT (SOF2) — full support via the multi-scan
            # core below (spectral selection + successive
            # approximation, r12 second pass).
            return _decode_jpeg_progressive(data)
        if marker in (0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "differential/arithmetic progressive JPEG not supported"
            )
        if marker in (0xC9, 0xCB, 0xCC, 0xCD):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        if marker in (0xC3, 0xC5, 0xC7, 0xCF):
            raise NotImplementedError(
                "lossless/differential JPEG not supported"
            )
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment")
        (length,) = struct.unpack(">H", data[pos + 2: pos + 4])
        if pos + 2 + length > len(data):
            raise ValueError("truncated JPEG segment")
        payload = data[pos + 4: pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                qts[tq] = list(payload[p + 1: p + 65])
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1: p + 17])
                n = sum(bits)
                vals = list(payload[p + 17: p + 17 + n])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision, height, width, nf = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG not supported (1 gray / 3 color)"
                )
            comps = []
            for ci in range(nf):
                cid, sampling, tq = payload[6 + 3 * ci: 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} not supported "
                        "(h, v must be 1 or 2)"
                    )
                comps.append((cid, hi, vi, tq))
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            if not comps or ns != len(comps):
                raise NotImplementedError(
                    "partial/multi-scan JPEG not supported (one "
                    "interleaved scan covering every SOF component)"
                )
            by_cid = {}
            for si in range(ns):
                cid, ids = payload[1 + 2 * si], payload[2 + 2 * si]
                by_cid[cid] = (ids >> 4, ids & 0xF)
            try:
                scan_ids = [by_cid[cid] for cid, _, _, _ in comps]
            except KeyError as exc:
                raise ValueError(
                    f"SOS references unknown component {exc}"
                ) from None
            pos = pos + 2 + length
            break
        pos += 2 + length
    if width is None or not scan_ids:
        raise ValueError("JPEG missing SOF/SOS")
    for _, _, _, tq in comps:
        if tq not in qts:
            raise ValueError("JPEG scan references missing DQT table")
    for dc_id, ac_id in scan_ids:
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG scan references missing DHT table")

    inv_zigzag = np.argsort(_ZIGZAG)
    qmats = [
        np.array(qts[tq], dtype=np.float64)[inv_zigzag].reshape(8, 8)
        for _, _, _, tq in comps
    ]
    tabs = [(huff[(0, d)], huff[(1, a)]) for d, a in scan_ids]
    c = _dct_mat()
    ncomp = len(comps)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    # MCU grid over the full image; each component's working plane is
    # its own sampled resolution, rounded up to whole MCUs.
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = [
        np.empty((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64)
        for _, h, v, _ in comps
    ]
    br = _BitReader(data, pos)
    prev_dc, mcu, rst_n = [0] * ncomp, 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_and_expect_rst(rst_n)
                rst_n += 1
                prev_dc = [0] * ncomp  # ALL predictors reset (F.2.1.3.1)
            # Interleaved MCU: h_i x v_i blocks per component in
            # raster order (T.81 A.2.3), components in SOF order.
            for ci in range(ncomp):
                _, hi, vi, _ = comps[ci]
                dc_tab, ac_tab = tabs[ci]
                for blk_r in range(vi):
                    for blk_c in range(hi):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_decode(br, dc_tab)
                        diff = (
                            _extend(br.read_bits(size), size) if size else 0
                        )
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_tab)
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC coefficient index overflow"
                                )
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz
                        coef = block.reshape(8, 8) * qmats[ci]
                        pix = c.T @ coef @ c + 128.0
                        py = (my * vi + blk_r) * 8
                        px_ = (mx * hi + blk_c) * 8
                        planes[ci][py: py + 8, px_: px_ + 8] = pix
            mcu += 1
    out = []
    for (_, hi, vi, _), plane in zip(comps, planes):
        # Upsample subsampled components back to full resolution by
        # replication (deterministic; fancy upsampling differs across
        # real decoders, and the roundtrip oracle is an error bound).
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        out.append(plane[:height, :width])
    return width, height, out


@_lru_cache(maxsize=None)
def _prog_ac_table() -> tuple[tuple[int, ...], tuple[int, ...], dict]:
    """(BITS, HUFFVAL, symbol->code) for the fixed flat-8 progressive
    AC table this encoder writes into its DHT segment.

    Progressive AC scans need EOBn symbols (n >= 1) that the Annex K
    baseline AC table cannot hold — its code space has exactly one
    16-bit slot free (the reserved all-ones code), which is why real
    encoders build per-scan optimized tables. A fixed CANONICAL table
    with every needed symbol at length 8 sidesteps the optimizer:
    (run, size) for run 0..15 x size 1..14, EOB0..EOB5, and ZRL = 231
    symbols, Kraft 231/256 < 1, max code 230 != the reserved all-ones.
    Compression is a few percent worse than optimized tables —
    irrelevant for a correctness codec; any spec decoder reads it as
    an ordinary DHT."""
    syms = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 15)}
        | {n << 4 for n in range(6)}
        | {0xF0}
    )
    bits = [0] * 16
    bits[7] = len(syms)  # every symbol at code length 8
    return tuple(bits), tuple(syms), _canonical_codes(bits, syms)


def encode_jpeg_gray_progressive(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale pixels as a PROGRESSIVE (SOF2) JFIF JPEG.

    Five-scan script exercising the full progressive feature set (ITU
    T.81 G.1.2): DC first scan at successive-approximation precision
    Al=1, DC refinement (Ah=1: one raw bit per block), two AC
    spectral-selection bands (1-5, 6-63) at Al=1 with EOB-run coding,
    and one AC refinement scan (Ah=1) emitting newly-significant
    coefficients plus correction bits for already-significant ones.
    Because every first scan drops exactly one bit (Al=1) and exactly
    one refinement scan restores it, the decoded coefficients are
    BIT-IDENTICAL to the sequential baseline encoding at the same
    quality — which is what the roundtrip query asserts
    (progressive-decoded pixels == baseline-decoded pixels).

    The quantization pipeline (Annex K luminance table, libjpeg
    quality scaling, orthonormal FDCT) is shared with
    :func:`encode_jpeg_gray`; the AC scans use the fixed flat-8 table
    of :func:`_prog_ac_table` (see there for why baseline tables
    cannot code EOBn).

    ``restart_interval`` (r13, ADVICE r12: the decoder's progressive
    restart paths had no in-repo producer) emits a DRI segment and
    splits EVERY scan into ``restart_interval``-MCU intervals joined
    by RST0-7 markers; each interval restarts the entropy coder with
    fresh DC predictors and a flushed EOB run / correction-bit queue
    (ITU T.81 G.1.2.3 via F.2.1.3.1 — in a non-interleaved
    single-component scan the MCU is one block)."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError(
            f"expected {width * height} pixels, got {len(pixels)}"
        )
    if width == 0 or height == 0:
        raise ValueError("JPEG cannot encode an empty image")
    qt = _scaled_qt(quality)
    qmat = np.array(qt, dtype=np.float64).reshape(8, 8)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    padded = _pad_plane(img, width, height)
    ph, pw = padded.shape
    c = _dct_mat()
    bh, bw_ = ph // 8, pw // 8
    coefs = np.zeros((bh, bw_, 64), dtype=np.int64)
    for byi in range(bh):
        for bxi in range(bw_):
            blk = padded[byi * 8: byi * 8 + 8, bxi * 8: bxi * 8 + 8] - 128.0
            q = np.round((c @ blk @ c.T) / qmat).astype(np.int64)
            coefs[byi, bxi] = q.reshape(64)[_ZIGZAG]

    dc_codes, _ = _std_codes()
    pbits, pvals, ac_codes = _prog_ac_table()
    blocks = [coefs[byi, bxi] for byi in range(bh) for bxi in range(bw_)]

    def dc_first(blks, al: int) -> bytes:
        bw2 = _BitWriter()
        prev = 0
        for zz in blks:
            v = int(zz[0]) >> al  # arithmetic shift = T.81 point transform
            size, mag = _mag_bits(v - prev)
            prev = v
            code, ln = dc_codes[size]
            bw2.write(code, ln)
            if size:
                bw2.write(mag, size)
        bw2.flush()
        return bytes(bw2.out)

    def dc_refine(blks, al: int) -> bytes:
        bw2 = _BitWriter()
        for zz in blks:
            bw2.write((int(zz[0]) >> al) & 1, 1)
        bw2.flush()
        return bytes(bw2.out)

    def ac_first(blks, ss: int, se: int, al: int) -> bytes:
        bw2 = _BitWriter()
        eobrun = 0

        def emit_eobrun() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            n = eobrun.bit_length() - 1
            code, ln = ac_codes[n << 4]
            bw2.write(code, ln)
            if n:
                bw2.write(eobrun - (1 << n), n)
            eobrun = 0

        for zz in blks:
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                # AC point transform truncates toward zero (G.1.2.1),
                # unlike the DC arithmetic shift.
                t = (v >> al) if v >= 0 else -((-v) >> al)
                if t == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw2.write(code, ln)
                    r -= 16
                size, mag = _mag_bits(t)
                if size > 14:
                    raise ValueError(
                        f"AC coefficient size {size} exceeds the flat "
                        "progressive table (max 14)"
                    )
                code, ln = ac_codes[(r << 4) | size]
                bw2.write(code, ln)
                bw2.write(mag, size)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 63:  # EOB5 ceiling: 32 + 31 extension
                    emit_eobrun()
        emit_eobrun()
        bw2.flush()
        return bytes(bw2.out)

    def ac_refine(blks, ss: int, se: int, al: int) -> bytes:
        bw2 = _BitWriter()
        eobrun = 0
        pend: list[int] = []  # correction bits owed by the open EOB run

        def emit_eobrun() -> None:
            nonlocal eobrun, pend
            if not eobrun:
                return
            n = eobrun.bit_length() - 1
            code, ln = ac_codes[n << 4]
            bw2.write(code, ln)
            if n:
                bw2.write(eobrun - (1 << n), n)
            # The run's covered blocks' correction bits follow the
            # EOBn symbol, in block order (G.1.2.3 / decoder's
            # eob-run branch).
            for b in pend:
                bw2.write(b, 1)
            eobrun = 0
            pend = []

        for zz in blks:
            absv = [
                (abs(int(zz[k])) >> al) for k in range(ss, se + 1)
            ]
            # Last newly-significant position: ZRLs are only emitted
            # while one remains ahead — trailing zeros and correction
            # bits past it fold into the EOB run instead (T.81
            # G.1.2.3; the decoder's EOB branch mirrors this).
            eobpos = ss - 1
            for idx in range(len(absv)):
                if absv[idx] == 1:
                    eobpos = ss + idx
            r = 0
            br_bits: list[int] = []  # bits owed since the last symbol
            for idx, k in enumerate(range(ss, se + 1)):
                t = absv[idx]
                if t == 0:
                    r += 1
                    continue
                # Drain pending ZRLs at EVERY nonzero coefficient
                # (not just newly-significant ones): the decoder
                # reads correction bits positionally while walking a
                # symbol's zero span, so each flushed bit must belong
                # to a position inside that span — deferring the
                # drain past an already-significant coefficient would
                # emit its bit after a span that never walks it.
                while r > 15 and k <= eobpos:
                    emit_eobrun()
                    code, ln = ac_codes[0xF0]
                    bw2.write(code, ln)
                    r -= 16
                    for b in br_bits:
                        bw2.write(b, 1)
                    br_bits = []
                if t > 1:
                    # Already significant at this precision: one
                    # correction bit, emitted after the next symbol.
                    br_bits.append(t & 1)
                    continue
                # t == 1: newly significant coefficient.
                emit_eobrun()
                code, ln = ac_codes[(r << 4) | 1]
                bw2.write(code, ln)
                bw2.write(1 if int(zz[k]) > 0 else 0, 1)
                for b in br_bits:
                    bw2.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pend.extend(br_bits)
                if eobrun == 63:
                    emit_eobrun()
        emit_eobrun()
        bw2.flush()
        return bytes(bw2.out)

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return _jpeg_seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    def scan_body(write_fn, *args) -> bytes:
        """Entropy bytes for one scan, split into restart intervals.

        Each interval runs the writer on its own block slice (fresh
        predictors / EOB run / correction queue — exactly the state a
        T.81 restart resets) and intervals join with RST0-7 markers,
        cycling, never after the last interval."""
        if not restart_interval:
            return write_fn(blocks, *args)
        out = bytearray()
        for j, i in enumerate(range(0, len(blocks), restart_interval)):
            if j:
                out += bytes([0xFF, 0xD0 + ((j - 1) % 8)])
            out += write_fn(blocks[i: i + restart_interval], *args)
        return bytes(out)

    scans = (
        sos(0, 0, 0, 1) + scan_body(dc_first, 1)
        + sos(0, 0, 1, 0) + scan_body(dc_refine, 0)
        + sos(1, 5, 0, 1) + scan_body(ac_first, 1, 5, 1)
        + sos(6, 63, 0, 1) + scan_body(ac_first, 6, 63, 1)
        + sos(1, 63, 1, 0) + scan_body(ac_refine, 1, 63, 0)
    )
    dqt = _jpeg_seg(0xDB, bytes([0]) + bytes(qt[i] for i in _ZIGZAG))
    sof = _jpeg_seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = _jpeg_seg(
        0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    ) + _jpeg_seg(0xC4, bytes([0x10]) + bytes(pbits) + bytes(pvals))
    dri = (
        _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + dri + scans + b"\xff\xd9"


def encode_jpeg_rgb_progressive(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved 8-bit RGB as a PROGRESSIVE (SOF2) color
    JPEG, 4:4:4, spectral selection only (r13, ADVICE r12: the
    decoder's interleaved multi-component DC scan and 3-component
    progressive paths had no in-repo producer).

    Four-scan script with Ah=Al=0 everywhere (T.81 permits spectral
    selection without successive approximation): one INTERLEAVED DC
    scan over all three components (the multi-component progressive
    shape — MCU = one block per component at 4:4:4, per-component
    predictors), then one single-component AC scan (Ss=1, Se=63) per
    component, as the spec requires for progressive AC. Because Al=0
    and every AC scan covers the full band, EOB runs never exceed one
    block and encode as the plain EOB symbol — so the BASELINE Annex
    K Huffman tables suffice (no EOBn extension symbols needed) and
    the decoded coefficients are bit-identical to the sequential
    4:4:4 encoding at the same quality. ``restart_interval`` emits
    DRI + RST0-7 in every scan (all-predictor reset in the
    interleaved scan)."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise ValueError(
            f"expected {width * height * 3} RGB bytes, got {len(pixels)}"
        )
    if width == 0 or height == 0:
        raise ValueError("JPEG cannot encode an empty image")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qt_l = _scaled_qt(quality)
    qt_c = _scaled_qt(quality, base=_JPEG_STD_CHROMA_QT)
    qm_l = np.array(qt_l, dtype=np.float64).reshape(8, 8)
    qm_c = np.array(qt_c, dtype=np.float64).reshape(8, 8)
    dc_l, ac_l = _std_codes()
    dc_c, ac_c = _std_chroma_codes()
    planes = [_pad_plane(p, width, height) for p in (y, cb, cr)]
    qmats = (qm_l, qm_c, qm_c)
    c = _dct_mat()
    ph, pw = planes[0].shape
    bh, bw_ = ph // 8, pw // 8
    # coefs[ci] = per-component list of zigzag int64[64] blocks in
    # raster order (4:4:4: MCU index == block index for every comp).
    coefs: list[list] = [[], [], []]
    for ci in range(3):
        for byi in range(bh):
            for bxi in range(bw_):
                blk = planes[ci][byi * 8: byi * 8 + 8, bxi * 8: bxi * 8 + 8] - 128.0
                q = np.round((c @ blk @ c.T) / qmats[ci]).astype(np.int64)
                coefs[ci].append(q.reshape(64)[_ZIGZAG])
    n_mcus = bh * bw_

    def dc_scan() -> bytes:
        out = bytearray()
        bw2 = _BitWriter()
        prev = [0, 0, 0]
        rst = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                bw2.flush()
                out += bytes(bw2.out) + bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                bw2 = _BitWriter()
                prev = [0, 0, 0]
            for ci, dc_codes in ((0, dc_l), (1, dc_c), (2, dc_c)):
                v = int(coefs[ci][m][0])
                size, mag = _mag_bits(v - prev[ci])
                prev[ci] = v
                code, ln = dc_codes[size]
                bw2.write(code, ln)
                if size:
                    bw2.write(mag, size)
        bw2.flush()
        out += bytes(bw2.out)
        return bytes(out)

    def ac_scan(ci: int, ac_codes) -> bytes:
        out = bytearray()
        bw2 = _BitWriter()
        rst = 0
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                bw2.flush()
                out += bytes(bw2.out) + bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                bw2 = _BitWriter()
            zz = coefs[ci][m]
            run = 0
            last = 0
            for k in range(1, 64):
                if int(zz[k]):
                    last = k
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw2.write(code, ln)
                    run -= 16
                size, mag = _mag_bits(v)
                code, ln = ac_codes[(run << 4) | size]
                bw2.write(code, ln)
                bw2.write(mag, size)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB (EOB-run of exactly 1)
                bw2.write(code, ln)
        bw2.flush()
        out += bytes(bw2.out)
        return bytes(out)

    # DC scan: Ta is meaningless in a DC-only scan, so keep it 0
    # (strict decoders reject a nonzero Ta here).
    dc_sos = _jpeg_seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x00]),
    )
    ac_sos = [
        _jpeg_seg(0xDA, bytes([1, cid, (tab << 4) | tab, 1, 63, 0x00]))
        for cid, tab in ((1, 0), (2, 1), (3, 1))
    ]
    scans = (
        dc_sos + dc_scan()
        + ac_sos[0] + ac_scan(0, ac_l)
        + ac_sos[1] + ac_scan(1, ac_c)
        + ac_sos[2] + ac_scan(2, ac_c)
    )
    dqt = _jpeg_seg(
        0xDB, bytes([0]) + bytes(qt_l[i] for i in _ZIGZAG)
    ) + _jpeg_seg(0xDB, bytes([1]) + bytes(qt_c[i] for i in _ZIGZAG))
    sof = _jpeg_seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = (
        _jpeg_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        + _jpeg_seg(
            0xC4, bytes([0x01]) + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS)
        )
        + _jpeg_seg(
            0xC4, bytes([0x11]) + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS)
        )
    )
    dri = (
        _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + dri + scans + b"\xff\xd9"


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First byte-aligned non-stuffed, non-restart marker at/after
    ``pos`` (the scan's entropy data ends here)."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,):
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2  # stray trailing restart — skip defensively
                continue
            return p
    # fill bytes (FF FF) resolve at the marker loop; advance past
    # everything else (entropy padding).
        p += 1
    raise ValueError("JPEG scan not terminated by a marker")


def _decode_jpeg_progressive(data: bytes):
    """Progressive (SOF2) JPEG decode core -> (width, height, planes).

    Full ITU T.81 G.2 feature set: spectral selection AND successive
    approximation for both DC and AC, EOB runs (EOBn), ZRL, refinement
    correction bits, interleaved (all-component) or single-component
    DC scans, single-component AC scans (as the spec requires),
    Huffman/quant table redefinition between scans, and restart
    intervals (predictors and the EOB run reset). Coefficients
    accumulate across scans per block in zigzag space; after the last
    scan every block dequantizes and inverse-transforms exactly like
    the baseline path, so a fully-refined progressive stream decodes
    BIT-IDENTICALLY to its sequential counterpart — the property the
    roundtrip query asserts. Raises by name on the shapes outside the
    contract (subset multi-component scans, sampling > 2, 16-bit DQT),
    matching the baseline core's honest-boundary convention."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    coefs: list = []  # per component: (blocks_y, blocks_x, 64) int64
    geom: list[tuple[int, int]] = []  # per component: non-interleaved grid
    mcus_x = mcus_y = 0
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(data):
                raise ValueError("truncated JPEG segment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment")
        (length,) = struct.unpack(">H", data[pos + 2: pos + 4])
        if pos + 2 + length > len(data):
            raise ValueError("truncated JPEG segment")
        payload = data[pos + 4: pos + 2 + length]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                qts[tq] = list(payload[p + 1: p + 65])
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1: p + 17])
                n = sum(bits)
                vals = list(payload[p + 17: p + 17 + n])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + n
        elif marker == 0xC2:
            precision, height, width, nf = struct.unpack(
                ">BHHB", payload[:6]
            )
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG not supported (1 gray / 3 color)"
                )
            comps = []
            for ci in range(nf):
                cid, sampling, tq = payload[6 + 3 * ci: 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} not supported "
                        "(h, v must be 1 or 2)"
                    )
                comps.append((cid, hi, vi, tq))
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            coefs, geom = [], []
            for _, hi, vi, _ in comps:
                coefs.append(
                    np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
                )
                cw = -(-width * hi // hmax)
                ch = -(-height * vi // vmax)
                geom.append((-(-ch // 8), -(-cw // 8)))
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            cid_to_ix = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
            members: list[tuple[int, int, int]] = []  # (comp_ix, dcid, acid)
            for si in range(ns):
                cid, ids = payload[1 + 2 * si], payload[2 + 2 * si]
                if cid not in cid_to_ix:
                    raise ValueError(f"SOS references unknown component {cid}")
                members.append((cid_to_ix[cid], ids >> 4, ids & 0xF))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            br = _BitReader(data, pos + 2 + length)
            _decode_prog_scan(
                br, comps, coefs, geom, members, ss, se, ah, al,
                huff, mcus_x, mcus_y, restart_interval,
            )
            saw_scan = True
            pos = _next_marker_pos(data, br.pos)
            continue
        pos += 2 + length
    if width is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    for _, _, _, tq in comps:
        if tq not in qts:
            raise ValueError("JPEG scan references missing DQT table")

    inv_zigzag = np.argsort(_ZIGZAG)
    c = _dct_mat()
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    planes = []
    for (cid, hi, vi, tq), cf in zip(comps, coefs):
        qmat = np.array(qts[tq], dtype=np.float64)[inv_zigzag].reshape(8, 8)
        by, bx = cf.shape[:2]
        plane = np.empty((by * 8, bx * 8), dtype=np.float64)
        for yy in range(by):
            for xx in range(bx):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = cf[yy, xx]
                coef = block.reshape(8, 8) * qmat
                plane[yy * 8: yy * 8 + 8, xx * 8: xx * 8 + 8] = (
                    c.T @ coef @ c + 128.0
                )
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[:height, :width])
    return width, height, planes


def _decode_prog_scan(
    br, comps, coefs, geom, members, ss, se, ah, al,
    huff, mcus_x, mcus_y, restart_interval,
):
    """Entropy-decode ONE progressive scan into the coefficient
    arrays (T.81 G.2; refinement algorithms per G.1.2.3)."""
    state = {"eobrun": 0}
    preds = [0] * len(members)

    def need(tc: int, th: int):
        tab = huff.get((tc, th))
        if tab is None:
            raise ValueError("JPEG scan references missing DHT table")
        return tab

    def dc_unit(zz, mi: int, dc_tab) -> None:
        if ah == 0:  # first DC scan at this precision
            size = _huff_decode(br, dc_tab)
            diff = _extend(br.read_bits(size), size) if size else 0
            preds[mi] += diff
            zz[0] = preds[mi] << al
        else:  # DC refinement: one raw bit
            if br.read_bit():
                zz[0] = int(zz[0]) | (1 << al)

    def ac_first_unit(zz) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = _huff_decode(br, ac_tab)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient index overflow")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def ac_refine_unit(zz) -> None:
        p1, m1 = 1 << al, -1 << al

        def correct(k: int) -> None:
            v = int(zz[k])
            if br.read_bit() and (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else m1)

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _huff_decode(br, ac_tab)
                r, s = sym >> 4, sym & 0xF
                val = 0
                if s == 0:
                    if r < 15:  # EOBn — rest of this block joins the run
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read_bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG AC refinement symbol must have size 1"
                        )
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if int(zz[k]) != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if int(zz[k]) != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    def restart(unit_n: int, rst: list) -> None:
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            br.align_and_expect_rst(rst[0])
            rst[0] += 1
            for i in range(len(preds)):
                preds[i] = 0
            state["eobrun"] = 0

    if len(members) > 1:
        # Interleaved scan: DC only (T.81 G.2 forbids interleaved AC),
        # and this decoder requires it to cover every SOF component
        # (the standard progressive scripts do; a subset interleave
        # would need per-scan MCU geometry).
        if ss != 0 or se != 0:
            raise ValueError("interleaved progressive AC scan is invalid")
        if len(members) != len(comps):
            raise NotImplementedError(
                "subset multi-component progressive scan not supported"
            )
        dc_tabs = [
            need(0, dcid) if ah == 0 else None
            for _, dcid, _ in members
        ]
        rst, mcu = [0], 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                restart(mcu, rst)
                mcu += 1
                for mi, (cx, _dcid, _acid) in enumerate(members):
                    _, hi, vi, _ = comps[cx]
                    for blk_r in range(vi):
                        for blk_c in range(hi):
                            yy = (_my * vi + blk_r)
                            xx = (_mx * hi + blk_c)
                            dc_unit(coefs[cx][yy, xx], mi, dc_tabs[mi])
        return
    # Single-component (non-interleaved) scan over the component's own
    # block grid.
    cx, dcid, acid = members[0]
    by, bx = geom[cx]
    dc_tab = need(0, dcid) if (ss == 0 and ah == 0) else None
    ac_tab = need(1, acid) if ss > 0 else None
    rst, unit = [0], 0
    for yy in range(by):
        for xx in range(bx):
            restart(unit, rst)
            unit += 1
            zz = coefs[cx][yy, xx]
            if ss == 0:
                if se != 0:
                    raise ValueError(
                        "progressive DC scan must have Se = 0"
                    )
                dc_unit(zz, 0, dc_tab)
            elif ah == 0:
                ac_first_unit(zz)
            else:
                ac_refine_unit(zz)


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG -> (width, height, pixels).

    Generic baseline decoder (shared core
    :func:`_decode_jpeg_planes`): parses DQT/DHT/SOF0/SOS/DRI from
    the file, unstuffs 0xFF00, honors restart markers. Progressive
    (SOF2), arithmetic coding, and subsampled streams raise
    ``NotImplementedError`` naming the missing piece; for 3-component
    4:4:4 color files use :func:`decode_jpeg_rgb`."""
    import numpy as np

    width, height, planes = _decode_jpeg_planes(data)
    if len(planes) != 1:
        raise NotImplementedError(
            "multi-component (color) JPEG: use decode_jpeg_rgb"
        )
    cropped = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return width, height, cropped.tobytes()


def decode_jpeg_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline 4:4:4 color JPEG -> (width, height, rgb).

    ``rgb`` is row-major interleaved R,G,B bytes. The three decoded
    planes are JFIF YCbCr (BT.601 full-range); conversion back is the
    standard R = Y + 1.402 Cr', G = Y - 0.344136 Cb' - 0.714136 Cr',
    B = Y + 1.772 Cb' with Cb' = Cb - 128, Cr' = Cr - 128. Grayscale
    (1-component) files decode too — the single plane is replicated
    to R=G=B, matching how every viewer renders them."""
    import numpy as np

    width, height, planes = _decode_jpeg_planes(data)
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, np.repeat(g[..., None], 3, axis=2).tobytes()
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()


# --------------------------------------------------------------------------
# Real WAV codec (PCM16 mono), stdlib-only.
# --------------------------------------------------------------------------
def encode_wav_pcm16(samples: list[int], rate: int = 16000) -> bytes:
    body = struct.pack(f"<{len(samples)}h", *samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(body),
    )
    return hdr + body


def decode_wav_pcm16(data: bytes) -> tuple[int, list[int]]:
    """Decode PCM16 mono WAV -> (sample_rate, samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag, length = data[pos: pos + 4], struct.unpack("<I", data[pos + 4: pos + 8])[0]
        chunk = data[pos + 8: pos + 8 + length]
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", chunk[:8])
            bits = struct.unpack("<H", chunk[14:16])[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{length // 2}h", chunk[: length & ~1]))
        pos += 8 + length + (length & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


# --------------------------------------------------------------------------
# Real AVI container (RIFF) with an MJPEG video stream, stdlib-only.
#
# MJPEG-in-AVI is the simplest real video format there is — every
# frame is an independent baseline JPEG in a '00dc' chunk — which
# makes it the honest first rung of the video ladder now that the
# JPEG codec above is complete: container parse, stream-header
# validation, demux, and per-frame decode are all REAL; only
# inter-frame codecs (H.264 etc.) remain NotImplementedError.
# Layout written and verified here (all little-endian):
#   RIFF <size> 'AVI '
#     LIST 'hdrl'  avih(56) + LIST 'strl' [ strh(56) + strf(40) ]
#     LIST 'movi'  '00dc' <jpeg> ...   (chunks padded to even)
#     'idx1'       16-byte entries (ckid, flags, offset, length)
# --------------------------------------------------------------------------
def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _riff_list(form: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", form + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write an AVI container holding one MJPEG video stream.

    ``frames`` are complete baseline-JPEG byte strings (one per video
    frame). The index ('idx1') is emitted with offsets relative to the
    'movi' fourcc, the convention every AVI-1.0 reader expects."""
    for i, f in enumerate(frames):
        if f[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} is not a JPEG stream")
    max_bytes = max((len(f) for f in frames), default=0)
    avih = _riff_chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,      # dwMicroSecPerFrame
            max_bytes * fps,       # dwMaxBytesPerSec
            0,                     # dwPaddingGranularity
            0x10,                  # dwFlags = AVIF_HASINDEX
            len(frames),           # dwTotalFrames
            0,                     # dwInitialFrames
            1,                     # dwStreams
            max_bytes,             # dwSuggestedBufferSize
            width, height,
            0, 0, 0, 0,            # dwReserved[4]
        ),
    )
    strh = _riff_chunk(
        b"strh",
        struct.pack(
            "<4s4sIHH8I4h",
            b"vids", b"MJPG",
            0, 0, 0,               # dwFlags, wPriority, wLanguage
            0,                     # dwInitialFrames
            1, fps,                # dwScale / dwRate = frame rate
            0, len(frames),        # dwStart, dwLength (in frames)
            max_bytes,             # dwSuggestedBufferSize
            10_000,                # dwQuality
            0,                     # dwSampleSize (0 = variable)
            0, 0, height, width,   # rcFrame (top, left, bottom, right)
        ),
    )
    strf = _riff_chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, width, height, 1, 24, b"MJPG",
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi_body = b""
    idx_entries = []
    for f in frames:
        # Offset convention: from the 'movi' fourcc to the chunk's
        # ckid; the first chunk therefore sits at offset 4.
        idx_entries.append((4 + len(movi_body), len(f)))
        movi_body += _riff_chunk(b"00dc", f)
    movi = _riff_list(b"movi", movi_body)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            struct.pack("<4sIII", b"00dc", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI container and demux its MJPEG frames.

    Returns ``(width, height, [jpeg_bytes, ...])``. Validates the
    stream headers (fccType 'vids', handler and biCompression 'MJPG'),
    cross-checks the demuxed frame count against avih dwTotalFrames
    and the idx1 entry count, and raises ``NotImplementedError``
    naming any non-MJPEG codec — the honest boundary: parsing is
    format-complete, decoding exists only for codecs implemented
    above."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    width = height = total = None
    handler = compression = None
    frames: list[bytes] = []
    idx_count = None

    def _sub_chunks(body: bytes):
        pos = 0
        while pos + 8 <= len(body):
            tag = body[pos : pos + 4]
            ln = struct.unpack("<I", body[pos + 4 : pos + 8])[0]
            yield tag, body[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)

    for tag, body in _sub_chunks(data[12 : 8 + struct.unpack("<I", data[4:8])[0]]):
        if tag == b"LIST":
            form, rest = body[:4], body[4:]
            if form == b"hdrl":
                for t2, b2 in _sub_chunks(rest):
                    if t2 == b"avih":
                        vals = struct.unpack("<14I", b2[:56])
                        total, width, height = vals[4], vals[8], vals[9]
                    elif t2 == b"LIST" and b2[:4] == b"strl":
                        for t3, b3 in _sub_chunks(b2[4:]):
                            if t3 == b"strh":
                                fcc_type, fcc_handler = b3[:4], b3[4:8]
                                if fcc_type != b"vids":
                                    raise NotImplementedError(
                                        f"AVI stream type {fcc_type!r} not "
                                        "supported (only 'vids')"
                                    )
                                handler = fcc_handler
                            elif t3 == b"strf":
                                compression = b3[16:20]
            elif form == b"movi":
                for t2, b2 in _sub_chunks(rest):
                    if t2[2:4] == b"dc":
                        frames.append(b2)
        elif tag == b"idx1":
            idx_count = len(body) // 16
    if width is None or height is None:
        raise ValueError("AVI missing avih header")
    for name, fourcc in (("handler", handler), ("biCompression", compression)):
        if fourcc is None:
            raise ValueError(f"AVI missing stream {name}")
        if fourcc not in (b"MJPG", b"mjpg"):
            raise NotImplementedError(
                f"AVI codec {fourcc!r} not supported (only MJPG)"
            )
    if total is not None and total != len(frames):
        raise ValueError(
            f"AVI frame count mismatch: avih says {total}, movi has {len(frames)}"
        )
    if idx_count is not None and idx_count != len(frames):
        raise ValueError(
            f"AVI idx1 mismatch: {idx_count} entries, {len(frames)} frames"
        )
    for i, f in enumerate(frames):
        if f[:2] != b"\xff\xd8":
            raise ValueError(f"AVI frame {i} is not a JPEG stream")
    return int(width), int(height), frames


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
                # ALWAYS the deterministic header-parser stub — never
                # branch on PIL availability: a real deployment would
                # swap this body for PIL.Image.open, but silently
                # switching decoders per-environment would make query
                # values machine-dependent (and the previous guard had
                # the polarity inverted — it raised exactly when PIL
                # WAS importable, hard-failing any cluster where some
                # other dep pulled Pillow in).
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
            out = {
                "media_id": [],
                "frame_idx": [],
                "frame_crc32": [],
                "frame_hex": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                body = b[_HDR_SIZE:] if b[:4] == _MAGIC else b
                n_frames = max(1, len(body) // 32)
                for idx in range(0, n_frames, every_n):
                    frame = body[idx * 32: (idx + 1) * 32]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_crc32"].append(zlib.crc32(frame))
                    out["frame_hex"].append(frame.hex())
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, FRAMES_SCHEMA)


def png_encode_pixels(df: DataFrame) -> DataFrame:
    """Encode stage: (media_id, width, height, pixels raw-gray bytes)
    -> (media_id, payload PNG bytes), Arrow-batched. The write half of
    a multimodal ingest pipeline; rows never leave the task."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                raw = _raw_gray(px)
                ids.append(mid)
                payloads.append(encode_png_gray(raw, int(w), int(h)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(enc, out_schema)


def jpeg_encode_pixels(df: DataFrame, quality: int = 90) -> DataFrame:
    """Encode stage: (media_id, width, height, pixels raw-gray bytes or
    int array) -> (media_id, payload baseline-JPEG bytes),
    Arrow-batched — the lossy twin of :func:`png_encode_pixels`. Rows
    never leave their task."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                raw = _raw_gray(px)
                ids.append(mid)
                payloads.append(
                    encode_jpeg_gray(raw, int(w), int(h), quality=quality)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(enc, out_schema)


JPEG_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("max_abs_err", T.LongType()),
    ]
)


def jpeg_roundtrip_error(df: DataFrame, quality: int = 90) -> DataFrame:
    """Codec-QA stage: encode each (media_id, width, height, pixels)
    row as baseline JPEG, decode it back, and emit the max absolute
    pixel error — the validation pass an ingest pipeline runs before
    trusting a lossy codec path at scale. Both codec halves run inside
    ONE mapInPandas task per batch; payload bytes are born and die
    task-side (never shuffled)."""

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                raw = _raw_gray(px)
                w, h = int(w), int(h)
                _, _, dec = decode_jpeg_gray(
                    encode_jpeg_gray(raw, w, h, quality=quality)
                )
                err = int(
                    np.abs(
                        np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                        - np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    ).max()
                )
                rows.append((mid, w, h, w * h, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "max_abs_err",
                ],
            )

    return df.mapInPandas(check, JPEG_ROUNDTRIP_SCHEMA)


JPEG_PROGRESSIVE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("max_abs_err", T.LongType()),
        T.StructField("matches_sequential", T.BooleanType()),
    ]
)


def jpeg_progressive_roundtrip_error(
    df: DataFrame, quality: int = 90
) -> DataFrame:
    """Progressive twin of :func:`jpeg_roundtrip_error`, with a
    strictly stronger check: each row encodes BOTH ways — the 5-scan
    progressive script (:func:`encode_jpeg_gray_progressive`) and the
    sequential baseline at the same quality — decodes both through
    the shared marker-dispatched core, and asserts the decoded pixel
    buffers are BYTE-IDENTICAL (every first scan drops exactly the
    one bit its refinement scan restores, so the coefficient arrays
    must coincide; any divergence in EOB-run, ZRL, correction-bit, or
    spectral-band handling flips the boolean). ``max_abs_err`` is
    reported against the source pixels as usual. All four codec
    passes run inside ONE mapInPandas task per batch — payloads never
    shuffle."""

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, w, h, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                raw = _raw_gray(px)
                w, h = int(w), int(h)
                _, _, dec_p = decode_jpeg_gray(
                    encode_jpeg_gray_progressive(raw, w, h, quality=quality)
                )
                _, _, dec_b = decode_jpeg_gray(
                    encode_jpeg_gray(raw, w, h, quality=quality)
                )
                err = int(
                    np.abs(
                        np.frombuffer(dec_p, dtype=np.uint8).astype(np.int64)
                        - np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    ).max()
                )
                rows.append((mid, w, h, w * h, err, dec_p == dec_b))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "max_abs_err", "matches_sequential",
                ],
            )

    return df.mapInPandas(check, JPEG_PROGRESSIVE_SCHEMA)


def jpeg_color_roundtrip_error(df: DataFrame, quality: int = 90) -> DataFrame:
    """Color twin of :func:`jpeg_roundtrip_error`: each row carries
    interleaved RGB in an ``rgb`` column (binary or int array,
    3*width*height values); encode as baseline color JFIF, decode,
    emit the max absolute error over all three channels. If the input
    carries a ``subsampling`` column ('444' or '420') each row is
    encoded with its own mode — 4:4:4 and 4:2:0 exercise DIFFERENT
    MCU interleave and chroma paths, so a mixed-mode frame covers
    both in one pass; without the column every row is 4:4:4. Same
    one-mapInPandas-stage contract — payload bytes never shuffle;
    ``n_pixels`` counts PIXELS (w*h), matching the shared schema."""

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            subs = (
                pdf["subsampling"]
                if "subsampling" in pdf.columns
                else ["444"] * len(pdf)
            )
            for mid, w, h, px, sub in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["rgb"],
                subs,
            ):
                raw = _raw_gray(px)  # byte coercion is channel-agnostic
                w, h = int(w), int(h)
                _, _, dec = decode_jpeg_rgb(
                    encode_jpeg_rgb(
                        raw, w, h, quality=quality, subsampling=str(sub)
                    )
                )
                err = int(
                    np.abs(
                        np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                        - np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    ).max()
                )
                rows.append((mid, w, h, w * h, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "max_abs_err",
                ],
            )

    return df.mapInPandas(check, JPEG_ROUNDTRIP_SCHEMA)


def _gray_gradient(mid: int, w: int, h: int) -> bytes:
    """Row-major gray gradient ``20 + id%40 + 2x + 3y`` as raw bytes —
    the multimodal_jpeg_roundtrip pixel formula, generated with numpy
    instead of the interpreted Catalyst ``transform(sequence(...))``
    (r13 optimization, guide §4.2: interpreted per-element HOF
    evaluation plus the Arrow transfer of the pixel array cost more
    than the codec itself; values are integer-exact either way)."""
    import numpy as np

    row = 20 + mid % 40 + 2 * np.arange(w, dtype=np.int64)
    img = row[None, :] + 3 * np.arange(h, dtype=np.int64)[:, None]
    return img.astype(np.uint8).tobytes()


def _rgb_gradient(mid: int, w: int, h: int) -> bytes:
    """Interleaved RGB gradient of multimodal_jpeg_color_roundtrip
    (R = 20+id%40+2x+3y, G = 10+(id%40)//2+3x+2y, B = 40+id%20+x+4y),
    numpy twin of the query's former Catalyst formula."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = 20 + mid % 40 + 2 * x + 3 * y
    g = 10 + (mid % 40) // 2 + 3 * x + 2 * y
    b = 40 + mid % 20 + x + 4 * y
    return (
        np.stack(
            [
                np.broadcast_to(r, (h, w)),
                np.broadcast_to(g, (h, w)),
                np.broadcast_to(b, (h, w)),
            ],
            axis=-1,
        )
        .astype(np.uint8)
        .tobytes()
    )


def jpeg_gradient_roundtrip(
    df: DataFrame, quality: int = 90, progressive: bool = False
) -> DataFrame:
    """Fused generate+roundtrip stage for the gradient corpus:
    (media_id, width, height) -> the :func:`jpeg_roundtrip_error`
    output (plus ``matches_sequential`` when ``progressive``), with
    the gradient pixels generated IN the task (``_gray_gradient``)
    instead of arriving as a Catalyst array column. One Python stage,
    three small int columns across the Arrow boundary instead of a
    per-pixel array — guide §4.1/§4.2 (r13 optimization; the decode
    and encode passes are unchanged)."""
    schema = JPEG_PROGRESSIVE_SCHEMA if progressive else JPEG_ROUNDTRIP_SCHEMA

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, w, h in zip(
                pdf["media_id"], pdf["width"], pdf["height"]
            ):
                mid, w, h = int(mid), int(w), int(h)
                raw = _gray_gradient(mid, w, h)
                if progressive:
                    _, _, dec = decode_jpeg_gray(
                        encode_jpeg_gray_progressive(raw, w, h, quality=quality)
                    )
                    _, _, dec_b = decode_jpeg_gray(
                        encode_jpeg_gray(raw, w, h, quality=quality)
                    )
                else:
                    _, _, dec = decode_jpeg_gray(
                        encode_jpeg_gray(raw, w, h, quality=quality)
                    )
                err = int(
                    np.abs(
                        np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                        - np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    ).max()
                )
                if progressive:
                    rows.append((mid, w, h, w * h, err, dec == dec_b))
                else:
                    rows.append((mid, w, h, w * h, err))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(check, schema)


def jpeg_gradient_color_roundtrip(df: DataFrame, quality: int = 90) -> DataFrame:
    """Color twin of :func:`jpeg_gradient_roundtrip`: (media_id,
    width, height, subsampling) -> :func:`jpeg_color_roundtrip_error`
    output, RGB gradient generated task-side (``_rgb_gradient``)."""

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, w, h, sub in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["subsampling"],
            ):
                mid, w, h = int(mid), int(w), int(h)
                raw = _rgb_gradient(mid, w, h)
                _, _, dec = decode_jpeg_rgb(
                    encode_jpeg_rgb(
                        raw, w, h, quality=quality, subsampling=str(sub)
                    )
                )
                err = int(
                    np.abs(
                        np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                        - np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    ).max()
                )
                rows.append((mid, w, h, w * h, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "max_abs_err",
                ],
            )

    return df.mapInPandas(check, JPEG_ROUNDTRIP_SCHEMA)


def mjpeg_framesample_fused(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Fused build+sample stage for the synthetic MJPEG corpus:
    (doc_id) -> the :func:`avi_frame_sample` output, with the AVI
    container born, parsed, demuxed and frame-decoded inside ONE
    Python evaluation. The unfused pipeline
    (``avi_frame_sample(documents_as_mjpeg_avi(df))``) chains two
    ``mapInPandas`` evaluations in one stage, so every container
    payload crosses the Arrow boundary twice (Python -> JVM ->
    Python); since the generator is query-local synthesis (at 100 TB
    the payload column comes from parquet and the two-stage shape
    stands), fusing it is free (r13 optimization, guide §4.1). The
    container encode/parse/decode helpers are byte-identical to the
    unfused operators'."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "width": [],
                "height": [], "min_gray": [], "max_gray": [],
            }
            for i in pdf["doc_id"]:
                mid = int(i)
                w = 16 + (mid % 3) * 8
                h = 16 + (mid % 2) * 8
                frames = [
                    encode_jpeg_gray(
                        bytes(
                            [hashlib.sha256(f"{mid}:{idx}".encode()).digest()[0]]
                        )
                        * (w * h),
                        w,
                        h,
                        quality=100,
                    )
                    for idx in range(2 + mid % 6)
                ]
                _, _, demuxed = decode_avi_mjpeg(encode_avi_mjpeg(frames, w, h))
                for idx in range(0, len(demuxed), every_n):
                    dw, dh, px = decode_jpeg_gray(demuxed[idx])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["width"].append(dw)
                    out["height"].append(dh)
                    out["min_gray"].append(min(px) if px else 0)
                    out["max_gray"].append(max(px) if px else 0)
            yield pd.DataFrame(out)

    return df.select("doc_id").mapInPandas(run, AVI_FRAMES_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage with REAL codecs, dispatching on payload magic:
    PNG -> pixel statistics (CRC-verified, inflated, un-filtered),
    JPEG -> pixel statistics (baseline DCT Huffman decode + IDCT),
    WAV -> PCM16 sample statistics, SGMM -> legacy fake-container
    header parse (byte statistics). Unknown magic raises — silent
    passthrough would hide corrupt inputs at scale."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                # Degenerate-but-valid assets (0x0 PNG, zero-length WAV
                # data chunk) must yield a row, not a task-killing
                # ValueError from min()/max() on an empty sequence.
                if b[:8] == _PNG_SIG:
                    w, h, px = decode_png_gray(b)
                    rows.append(
                        (mid, "png", w, h, len(px), sum(px),
                         min(px) if px else 0, max(px) if px else 0)
                    )
                elif b[:2] == b"\xff\xd8":
                    # Grayscale decodes to one plane; 3-component
                    # (4:4:4 color) files route to the RGB decoder and
                    # report stats over the interleaved RGB bytes
                    # under their own format tag, so gray-JPEG
                    # consumers' numbers are unchanged.
                    try:
                        w, h, px = decode_jpeg_gray(b)
                        fmt = "jpeg"
                    except NotImplementedError as exc:
                        if "decode_jpeg_rgb" not in str(exc):
                            raise
                        w, h, px = decode_jpeg_rgb(b)
                        fmt = "jpeg_rgb"
                    rows.append(
                        (mid, fmt, w, h, len(px), sum(px),
                         min(px) if px else 0, max(px) if px else 0)
                    )
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    # NOTE: for audio the (width, height) slots carry
                    # (sample_rate, 0) — DECODED_MEDIA_SCHEMA is one
                    # shape for all kinds; filter on kind before
                    # interpreting the dimension columns.
                    rate, samples = decode_wav_pcm16(b)
                    rows.append(
                        (
                            mid, "wav", rate, 0, len(samples),
                            sum(samples),
                            min(samples) if samples else 0,
                            max(samples) if samples else 0,
                        )
                    )
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    # Video: demux + decode EVERY frame's luma; stats
                    # run over the concatenated decoded pixels.
                    w, h, frames = decode_avi_mjpeg(b)
                    px = b"".join(
                        decode_jpeg_gray(f)[2] for f in frames
                    )
                    rows.append(
                        (
                            mid, "avi_mjpeg", w, h, len(px),
                            sum(px),
                            min(px) if px else 0,
                            max(px) if px else 0,
                        )
                    )
                elif b[:4] == _MAGIC:
                    _, _, w, h = struct.unpack(_HDR_FMT, b[:_HDR_SIZE])
                    body = b[_HDR_SIZE:]
                    rows.append(
                        (
                            mid, "sgmm", w, h, len(body),
                            sum(body),
                            min(body) if body else 0,
                            max(body) if body else 0,
                        )
                    )
                else:
                    raise ValueError(f"unknown media magic for id {mid}")
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height",
                    "n_values", "value_sum", "value_min", "value_max",
                ],
            )

    return df.mapInPandas(decode, DECODED_MEDIA_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real nearest-neighbor resize for PNG payloads:
    decode -> numpy integer-index resample -> re-encode. Returns
    (media_id, payload) with payload a valid PNG of the target size.
    Non-PNG payloads raise (resampling audio/video needs a different
    operator)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:8] != _PNG_SIG:
                    raise ValueError(f"resize_image: id {mid} is not a PNG")
                w, h, px = decode_png_gray(b)
                if w == 0 or h == 0:
                    # A 0x0 source is decodable (decode_media emits
                    # stats for it) but has no pixels to sample — the
                    # numpy index below would die with an opaque
                    # IndexError mid-task (r11 review).
                    raise ValueError(
                        f"resize_image: id {mid} is {w}x{h}; cannot "
                        "resample an empty image"
                    )
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                resized = img[ys][:, xs]
                ids.append(mid)
                payloads.append(
                    encode_png_gray(resized.tobytes(), width, height)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(resize, out_schema)


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


def wav_encode_samples(df: DataFrame) -> DataFrame:
    """Encode stage: (media_id, samples int array) -> (media_id,
    payload WAV PCM16 bytes), Arrow-batched — the audio twin of
    png_encode_pixels. Rows never leave their task."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, samples in zip(pdf["media_id"], pdf["samples"]):
                ids.append(mid)
                payloads.append(
                    encode_wav_pcm16([int(s) for s in samples])
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(enc, out_schema)


def wav_resample_half(df: DataFrame) -> DataFrame:
    """Transform stage: decimate WAV PCM16 payloads 2:1 — decode,
    average non-overlapping sample pairs (y[i] = floor((x[2i] +
    x[2i+1]) / 2), the box low-pass that precedes naive decimation;
    a trailing odd sample is dropped), re-encode at half the rate.
    (media_id, payload) -> (media_id, payload), Arrow-batched, rows
    never leave their task — the shape of every sample-rate
    normalization pass an audio training pipeline runs before
    featurization. floor() (not int()'s truncation) so the DuckDB
    oracle's floor((a+b)/2.0) replays negative pairs identically."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def resample(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, x = decode_wav_pcm16(bytes(payload))
                y = [
                    (x[2 * i] + x[2 * i + 1]) // 2
                    for i in range(len(x) // 2)
                ]
                ids.append(mid)
                payloads.append(encode_wav_pcm16(y, rate=rate // 2))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(resample, out_schema)


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_energy(df: DataFrame) -> DataFrame:
    """Feature-extraction stage for audio: decode WAV PCM16 payloads
    and emit integer signal statistics, including total energy
    (sum of squared samples — exact in int64 for PCM16). The shape of
    every real audio featurizer (MFCC, spectrogram): decode in the
    task, emit a small typed row."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav_pcm16(bytes(payload))
                rows.append(
                    (
                        mid,
                        rate,
                        len(samples),
                        sum(samples),
                        sum(s * s for s in samples),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "rate", "n_samples", "sample_sum", "energy"],
            )

    return df.mapInPandas(feats, AUDIO_ENERGY_SCHEMA)


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash over 9x8 image payloads:
    bit (r, c) = pixel[r][c] < pixel[r][c+1], packed row-major into
    two 32-bit halves (rows 0-3 -> dhash_hi, rows 4-7 -> dhash_lo) so
    no value touches the sign bit of a 64-bit long.

    Input rows are (media_id, payload) where payload is a 9x8
    grayscale PNG (normally the output of ``resize_image(df, 9, 8)``)
    or a 9x8 JPEG — grayscale OR 4:4:4 color, whose LUMA plane is
    hashed directly (dHash is defined over luminance; the Y plane of
    the JPEG's own YCbCr is exactly that, no RGB detour). Other sizes
    raise. Near-duplicate images agree on most bits, identical
    gradients hash identically, so groupBy(dhash) is the image twin
    of text fingerprint dedup and hamming-band joins are the scale
    path (same banding as simhash: 16-bit chunks, pigeonhole).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash_hi", T.LongType()),
            T.StructField("dhash_lo", T.LongType()),
        ]
    )

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, his, los = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"\xff\xd8":
                    # JPEG: hash the luma plane (plane 0 is gray or Y).
                    w, h, planes = _decode_jpeg_planes(b)
                    px = (
                        np.clip(np.round(planes[0]), 0, 255)
                        .astype(np.uint8)
                        .tobytes()
                    )
                else:
                    w, h, px = decode_png_gray(b)
                if (w, h) != (9, 8):
                    raise ValueError(
                        f"image_dhash: id {mid} is {w}x{h}, expected 9x8"
                    )
                hi = lo = 0
                for r in range(8):
                    for c in range(8):
                        bit = int(px[r * 9 + c] < px[r * 9 + c + 1])
                        if r < 4:
                            hi |= bit << (r * 8 + c)
                        else:
                            lo |= bit << ((r - 4) * 8 + c)
                ids.append(mid)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {"media_id": ids, "dhash_hi": his, "dhash_lo": los}
            )

    return df.mapInPandas(hash_batch, out_schema)


def documents_as_mjpeg_avi(df: DataFrame) -> DataFrame:
    """Deterministic REAL video corpus from documents: doc_id -> an
    AVI/MJPEG container (``encode_avi_mjpeg``) holding
    ``2 + doc_id % 6`` frames of ``(16 + id%3*8) x (16 + id%2*8)``
    grayscale baseline JPEG. Frame ``i`` is FLAT at gray level
    ``sha256(f"{id}:{i}")[0]`` encoded at quality 100 — flat blocks
    have only a DC coefficient and the q100 quant table is all ones,
    so the JPEG round-trips the level EXACTLY (unit-proven in
    tests/test_multimodal.py), which is what makes the downstream
    sampling stage fully value-checkable in SQL. Containers are born
    and consumed task-side (mapInPandas), never shuffled."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                mid = int(i)
                w = 16 + (mid % 3) * 8
                h = 16 + (mid % 2) * 8
                frames = [
                    encode_jpeg_gray(
                        bytes(
                            [hashlib.sha256(f"{mid}:{idx}".encode()).digest()[0]]
                        )
                        * (w * h),
                        w,
                        h,
                        quality=100,
                    )
                    for idx in range(2 + mid % 6)
                ]
                ids.append(mid)
                payloads.append(encode_avi_mjpeg(frames, w, h))
            yield pd.DataFrame(
                {"media_id": ids, "kind": "video", "payload": payloads}
            )

    return df.select("doc_id").mapInPandas(build, schema)


AVI_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("min_gray", T.LongType()),
        T.StructField("max_gray", T.LongType()),
    ]
)


def avi_frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: parse each AVI container
    (``decode_avi_mjpeg`` — header validation, MJPEG demux), keep
    every ``every_n``-th frame, run the real baseline-JPEG decoder on
    each KEPT frame only (decode-after-filter: at scale the sampler
    must never pay for frames it drops), and emit per-frame decoded
    pixel extrema. 1-to-many row expansion happens inside the task —
    payload bytes never shuffle."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "min_gray": [],
                "max_gray": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, frames = decode_avi_mjpeg(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    w, h, px = decode_jpeg_gray(frames[idx])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["min_gray"].append(min(px) if px else 0)
                    out["max_gray"].append(max(px) if px else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, AVI_FRAMES_SCHEMA)


def documents_as_video(df: DataFrame) -> DataFrame:
    """Deterministic video corpus from documents: doc_id -> SGMM
    container holding ``2 + doc_id % 6`` 32-byte frame slots
    (``make_payload``'s sha256 frame formula — re-derivable in SQL,
    which is what makes the sampling stage value-checkable). The
    container build runs inside ``mapInPandas`` so payload bytes are
    born and consumed task-side, never shuffled."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "payload": [
                        make_payload(int(i), "video", 16, 16, 2 + int(i) % 6)
                        for i in pdf["doc_id"]
                    ],
                }
            )

    return df.select("doc_id").mapInPandas(build, schema)
