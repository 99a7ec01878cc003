"""Exhaustive error-bound sweep for multimodal_jpeg_color_roundtrip.

The query generates per-doc RGB gradients with
  w = 8 + id%9, h = 8 + id%7,
  R = 20 + id%40 + 2x + 3y
  G = 10 + (id%40)//2 + 3x + 2y
  B = 40 + id%20 + x + 4y
so the (width, height, pixel-values) class of any doc_id is
determined by id mod lcm(9, 7, 40) = 2520. Sweeping all 2520 classes
measures the exact worst-case roundtrip error at the query's quality
setting, for BOTH sampling modes the query alternates between —
the fixed deterministic facts the oracle pins (same protocol as the
r11 grayscale sweep): at quality 90, worst 3 for 4:4:4 and 5 for
4:2:0 (r12)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from hdfs_parquet_importer_spark.operators import multimodal as M


def rgb_for(doc_id: int) -> tuple[int, int, bytes]:
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    m40, m20 = doc_id % 40, doc_id % 20
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((
                20 + m40 + 2 * x + 3 * y,
                10 + m40 // 2 + 3 * x + 2 * y,
                40 + m20 + x + 4 * y,
            ))
    return w, h, bytes(out)


def main() -> int:
    quality = int(sys.argv[1]) if len(sys.argv) > 1 else 90
    for sub in ("444", "420"):
        worst, worst_id = -1, -1
        for did in range(2520):
            w, h, rgb = rgb_for(did)
            _, _, dec = M.decode_jpeg_rgb(
                M.encode_jpeg_rgb(rgb, w, h, quality=quality, subsampling=sub)
            )
            err = int(
                np.abs(
                    np.frombuffer(dec, np.uint8).astype(np.int64)
                    - np.frombuffer(rgb, np.uint8).astype(np.int64)
                ).max()
            )
            if err > worst:
                worst, worst_id = err, did
        print(
            f"quality={quality} subsampling={sub}: "
            f"worst max_abs_err={worst} at class {worst_id}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
