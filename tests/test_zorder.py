"""Z-order layout: curve properties and the pruning payoff.

The payoff test measures what a scan planner would see: per-file
min/max boxes (exactly what parquet footers expose to row-group and
file skipping). A Z-ordered write must produce files whose boxes are
tight in BOTH indexed dimensions, where a single-column sort is tight
in one and spans the full domain in the other.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.operators.zorder import (
    quantize,
    z_value,
    zorder_by,
    zorder_write,
)
from hdfs_parquet_importer_spark.tables import load_table


def test_z_value_quadrant_ordering(spark):
    """All points in the low-low quadrant sort below all points in the
    high-high quadrant: the top interleaved bit dominates."""
    df = spark.createDataFrame(
        [(x, y) for x in (0.0, 0.4, 0.6, 1.0) for y in (0.0, 0.4, 0.6, 1.0)],
        ["x", "y"],
    )
    bits = 8
    out = df.select(
        "x",
        "y",
        z_value(
            [quantize(F.col("x"), 0.0, 1.0, bits),
             quantize(F.col("y"), 0.0, 1.0, bits)],
            bits,
        ).alias("z"),
    ).collect()
    lo = [r["z"] for r in out if r["x"] <= 0.4 and r["y"] <= 0.4]
    hi = [r["z"] for r in out if r["x"] >= 0.6 and r["y"] >= 0.6]
    assert max(lo) < min(hi)


def test_quantize_clips_out_of_bounds(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,)], ["v"])
    got = [r["q"] for r in
           df.select(quantize(F.col("v"), 0.0, 1.0, 4).alias("q")).collect()]
    assert got == [0, 7, 15]


def test_quantize_rejects_degenerate_bounds(spark):
    """hi <= lo would NaN the scale and silently clip every row into
    the top cell — must raise instead (constant column via
    zorder_by's auto min/max is the real-world trigger)."""
    import pytest

    with pytest.raises(ValueError, match="degenerate"):
        quantize(F.col("v"), 3.0, 3.0, 4)
    with pytest.raises(ValueError, match="degenerate"):
        quantize(F.col("v"), 5.0, 2.0, 4)


def _file_boxes(path: str, cols: list[str]):
    """Per-file (min, max) for each col, straight from parquet footers."""
    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        box = {}
        for c in cols:
            idx = names[c]
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            box[c] = (min(los), max(his))
        boxes.append(box)
    return boxes


def _mean_coverage(boxes, col, glo, ghi):
    span = ghi - glo
    return sum((hi - lo) / span for lo, hi in (b[col] for b in boxes)) / len(boxes)


@pytest.mark.parametrize("n_files", [8])
def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path, n_files):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    glo = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice"),
        F.min("o_custkey"), F.max("o_custkey"),
    ).first()
    p_lo, p_hi, c_lo, c_hi = (float(v) for v in glo)

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    zorder_write(orders, ["o_totalprice", "o_custkey"], zpath, n_files=n_files)
    # Baseline: classic single-column range-sorted layout.
    (
        orders.repartitionByRange(n_files, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite").parquet(spath)
    )

    zb = _file_boxes(zpath, ["o_totalprice", "o_custkey"])
    sb = _file_boxes(spath, ["o_totalprice", "o_custkey"])
    assert len(zb) >= 4 and len(sb) >= 4

    z_price = _mean_coverage(zb, "o_totalprice", p_lo, p_hi)
    z_cust = _mean_coverage(zb, "o_custkey", c_lo, c_hi)
    s_price = _mean_coverage(sb, "o_totalprice", p_lo, p_hi)
    s_cust = _mean_coverage(sb, "o_custkey", c_lo, c_hi)

    # The sorted layout is degenerate off-key: custkey boxes span
    # (nearly) the whole domain in every file.
    assert s_cust > 0.9
    # Z-order trades a little price tightness for pruning power on
    # BOTH dimensions: each file's box covers well under the full
    # span in each dim, and the sorted layout's price advantage
    # doesn't extend to custkey.
    assert z_price < 0.8
    assert z_cust < 0.8
    assert z_cust < s_cust - 0.2
    # And the round trip loses nothing.
    assert (
        spark.read.parquet(zpath).count() == orders.count()
    )


def test_zorder_by_explicit_bounds_is_projection_only(spark, sf_dir):
    """With explicit bounds there is no stats pass: the curve column
    is a pure projection (no extra jobs, no shuffle in the plan)."""
    orders = load_table(spark, sf_dir, "orders")
    zdf = zorder_by(
        orders,
        ["o_totalprice", "o_custkey"],
        bits=8,
        bounds={"o_totalprice": (0.0, 600000.0), "o_custkey": (0.0, 2000.0)},
    )
    plan = zdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_z_value_roundtrip_bijection(spark):
    """Deinterleaving the curve value in plain Python recovers the
    quantized coordinates exactly — the interleave is a bijection on
    the full 2^bits x 2^bits grid."""
    bits = 5
    df = spark.createDataFrame(
        [(a, b) for a in range(1 << bits) for b in range(1 << bits)],
        ["qa", "qb"],
    )
    out = df.select(
        "qa", "qb",
        z_value([F.col("qa").cast("long"), F.col("qb").cast("long")], bits).alias("z"),
    ).collect()
    for r in out:
        a = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(bits))
        b = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(bits))
        assert (a, b) == (r["qa"], r["qb"])
    assert len({r["z"] for r in out}) == 1 << (2 * bits)
