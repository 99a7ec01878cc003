"""Measure the SemDeDup cluster-count knob at scale (VERDICT r9 item
4; recall column added per VERDICT r10 item 2): at the study's sf0.5
and sf1 points, compare candidate-pair space, wall time, AND detected
edge-set / removed-doc recall at bits=3 (the registered query's pinned
demo setting) vs bits=6 (the production direction — more clusters as
the corpus grows), and write the measured table into SCALING.md
(replacing any previous knob section).

Predicted arithmetic: pair work = sum_b C(n_b, 2) ~ n^2 / 2^bits for
balanced buckets, so 3 -> 6 bits predicts ~8x less pair work. The
knob is NOT free in what it finds: dedup is cluster-scoped by
definition, so a near-dup pair split across two finer buckets is
simply not a candidate. srp_bucket's nested-prefix property makes the
bits=6 edge set a strict SUBSET of the bits=3 edge set, so
`edge recall` = |E_6| / |E_3| exactly; `removed recall` is the
fraction of bits=3 is_removed docs still removed at bits=6 (roots can
shift, so it is measured as a true set intersection). The value-level
oracle (tests/test_semdedup_knob.py) holds at BOTH settings because
the DuckDB twin replays the same buckets — it pins the semantics per
setting, not equality across settings.

The sf1 half also explains SCALING.md's dedup_semdedup 0.1->1 decade
cell: with bits FIXED at 3 the pair space grows ~100x per data
decade, which is precisely the regime the production sizing rule
(clusters ~ corpus size) exists to prevent.

Run AFTER tools/scaling.py (which rewrites SCALING.md wholesale and
generates the sf0.5/sf1 data this reads); nothing else on the host —
the timing halves are measured.

Usage: python tools/semdedup_knob_study.py [sf_dir ...]
       (default: /tmp/spark_graft_sf0.5 /tmp/spark_graft_sf1)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hdfs_parquet_importer_spark.operators.semdedup import (  # noqa: E402
    semdedup,
    semdedup_edges,
    srp_bucket,
)
from hdfs_parquet_importer_spark.operators.util import (  # noqa: E402
    ensure_parallelism,
)
from hdfs_parquet_importer_spark.session import build_session  # noqa: E402

DEFAULT_DIRS = ("/tmp/spark_graft_sf0.5", "/tmp/spark_graft_sf1")

_SECTION_HEADER = "## SemDeDup cluster-count knob (tools/semdedup_knob_study.py)"


def _label(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.removeprefix("spark_graft_") or base


def _replace_section(path: str, section: str) -> None:
    """Replace the knob section in SCALING.md (or append if absent) so
    re-runs don't accumulate stale duplicate tables."""
    with open(path) as fh:
        text = fh.read()
    pattern = re.compile(
        re.escape(_SECTION_HEADER) + r".*?(?=\n## |\Z)", re.DOTALL
    )
    if pattern.search(text):
        text = pattern.sub(section.rstrip("\n") + "\n", text)
    else:
        text = text.rstrip("\n") + "\n\n" + section.rstrip("\n") + "\n"
    with open(path, "w") as fh:
        fh.write(text)


def main() -> int:
    sf_dirs = sys.argv[1:] or list(DEFAULT_DIRS)
    spark = build_session(
        "semdedup-knob",
        shuffle_partitions=32,
        conf={
            "spark.ui.showConsoleProgress": "false",
            # 32g, not 64g — the r12 second-pass protocol finding
            # (tools/scaling.py, SCALING.md string-key addendum): a
            # 64g max heap degraded checkpoint-heavy stages 5-25x on
            # this host; 32g still clears the quadratic edge stage's
            # localCheckpoint at sf1.
            "spark.driver.memory": "32g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # (label, n, bits, pairs, edges, edge_recall, rm_recall, min_s, out)
    rows = []
    for sf_dir in sf_dirs:
        # Same scan path as the registered query: the generated
        # parquet has only 4 files, so without ensure_parallelism the
        # quadratic pair join runs ~4-wide and the walls here would
        # read ~3x the scaling table's dedup_semdedup cells.
        emb = ensure_parallelism(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        )
        n = emb.count()
        base_edges: int | None = None
        base_removed: set | None = None
        for bits in (3, 6):
            pairs = (
                emb.select(srp_bucket(F.col("embedding"), bits).alias("b"))
                .groupBy("b")
                .count()
                .agg(
                    F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
                )
                .collect()[0]["p"]
            )
            # One edge materialization serves BOTH the recall count
            # and the CC-stage warmup (r11 ADVICE: the old separate
            # semdedup_edges().count() + semdedup().count() pair ran
            # the tool's most expensive stage twice per point); the
            # timed samples below still run the FULL pipeline — that
            # is the cost the scaling table prices.
            edges_df = semdedup_edges(emb, bits=bits)
            n_edges = edges_df.count()
            semdedup(emb, bits=bits, precomputed_edges=edges_df).count()
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = semdedup(emb, bits=bits).collect()
                samples.append(time.perf_counter() - t0)
            removed = {r["vec_id"] for r in out if r["is_removed"]}
            if bits == 3:
                base_edges, base_removed = n_edges, removed
                edge_recall = rm_recall = 1.0
            else:
                # Nested-prefix refinement => E_bits is a strict
                # subset of E_3, so the count ratio IS the recall.
                edge_recall = n_edges / max(base_edges, 1)
                rm_recall = len(removed & base_removed) / max(
                    len(base_removed), 1
                )
            rows.append(
                (_label(sf_dir), n, bits, int(pairs), n_edges,
                 round(edge_recall, 3), round(rm_recall, 3),
                 round(min(samples), 2), len(out))
            )
            print(
                f"{_label(sf_dir)} bits={bits}: pairs={int(pairs):,} "
                f"edges={n_edges:,} edge_recall={edge_recall:.3f} "
                f"removed_recall={rm_recall:.3f} "
                f"min_s={min(samples):.2f} out_rows={len(out)}",
                flush=True,
            )

    table = "\n".join(
        f"| {lbl} | {n:,} | {bits} | {1 << bits} | {pairs:,} | {e:,} "
        f"| {er} | {rr} | {t} | {o} |"
        for lbl, n, bits, pairs, e, er, rr, t, o in rows
    )
    by_key = {
        (lbl, bits): (pairs, t, er, rr)
        for lbl, n, bits, pairs, e, er, rr, t, o in rows
    }
    reductions = []
    for lbl in dict.fromkeys(lbl for lbl, *_ in rows):
        if (lbl, 3) in by_key and (lbl, 6) in by_key:
            p3, t3, _, _ = by_key[(lbl, 3)]
            p6, t6, er6, rr6 = by_key[(lbl, 6)]
            reductions.append(
                f"{lbl}: pair space {p3 / max(p6, 1):.1f}x smaller, "
                f"wall {t3 / max(t6, 1e-9):.1f}x faster, at edge "
                f"recall {er6:.0%} / removed recall {rr6:.0%}"
            )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    section = (
        f"{_SECTION_HEADER}\n\n"
        "The `bits` knob of `operators/semdedup.py` is the "
        "production scale dial: cluster count ~ corpus size keeps "
        "expected cluster size constant and total pair work linear. "
        "It buys that cost with cluster-scoped RECALL — a near-dup "
        "pair split across two finer buckets is not a candidate "
        "(`edge recall` = |E_bits|/|E_3|, exact because srp_bucket "
        "buckets nest; `removed recall` = fraction of bits=3 "
        "is_removed docs still removed). Measured at the two "
        "generated scale points (min of 3 runs after warmup; the "
        "value oracle in tests/test_semdedup_knob.py holds at both "
        "settings — it pins each setting's semantics, not equality "
        "across settings):\n\n"
        "| sf | vectors | bits | clusters | candidate pairs | edges "
        "| edge recall | removed recall | wall s | out rows |\n"
        "|---|---|---|---|---|---|---|---|---|---|\n"
        f"{table}\n\n"
        f"3 -> 6 bits (predicted ~8x for balanced buckets): "
        f"{'; '.join(reductions)}. The dedup_semdedup 0.1->1 "
        "decade ratio in the table above is the FIXED-bits=3 "
        "demo pinned for its DuckDB oracle — pair space grows "
        "~100x per decade there by construction; this knob is "
        "the production answer, priced in recall by the two "
        "columns above. Interpretation: this corpus has no planted "
        "embedding near-dups, so threshold-0.35 edges are BORDERLINE "
        "pairs (cosine barely over threshold) — the worst case for "
        "bucket refinement, since SRP collision probability is "
        "1 - bits*theta/pi and theta is large near the threshold. "
        "True near-duplicates (cosine -> 1, theta -> 0) collide with "
        "probability -> 1 at any bits, so production recall on REAL "
        "dup pairs sits far above the edge-recall floor measured "
        "here; the removed-recall column (0.60-0.87) is the "
        "decision-level view of the same effect.\n"
    )
    _replace_section(os.path.join(here, "SCALING.md"), section)
    print("SCALING.md knob section updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
