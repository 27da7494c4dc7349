"""Corpus-assembly operators off the fixed-overhead floor: pack_chunks
(per-stratum window cumsum) and mixture_weights (groupBy + 1-row
broadcast) at 50.8 k vs 508 k documents, same corpus constructor as
BENCH/bench_dedup_scale.py so the arms are comparable across files.

Both should be ~linear: packing shuffles once on the stratum key and
prefix-scans each stratum; mixture is a map-side-combined aggregate.
Anything super-linear gets an attribution note in BENCH/NOTES.md.

Usage: python BENCH/bench_assembly_scale.py   (one session, both arms).
Writes BENCH/assembly_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench_sf1 as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SEQ_LEN = 2048
N_STRATA = 20


def run_arm(spark, mult: int) -> dict:
    from illumio_spark.operators.curation import (
        mixture_weights,
        pack_chunks,
        pack_stats,
    )

    # docs_corpus carries (doc_id, text); derive a stable 20-way stratum
    # in place of the sf tables' source column
    corpus = S.docs_corpus(spark, mult).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % N_STRATA)).cast("string")
    )
    out: dict = {"mult": mult, "n_docs": corpus.count()}

    t0 = time.time()
    packed = pack_chunks(corpus, SEQ_LEN)
    n = packed.count()  # full compute of every doc's coordinates
    out["pack_chunks_s"] = round(time.time() - t0, 3)
    out["pack_chunks_rows"] = n

    t0 = time.time()
    stats = pack_stats(pack_chunks(corpus, SEQ_LEN), SEQ_LEN).collect()
    out["pack_stats_s"] = round(time.time() - t0, 3)
    out["pack_stats_rows"] = len(stats)
    out["total_packs"] = int(sum(r.n_packs for r in stats))
    out["fill_frac_min"] = round(min(r.fill_frac for r in stats), 4)

    t0 = time.time()
    mix = mixture_weights(
        corpus, {f"src{i}": 1.0 for i in range(0, N_STRATA, 2)}
    ).collect()
    out["mixture_weights_s"] = round(time.time() - t0, 3)
    out["mixture_rows"] = len(mix)
    return out


def main() -> None:
    from illumio_spark.session import build_session

    spark = build_session(app_name="assembly_scale", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    arms = [run_arm(spark, 1), run_arm(spark, 100)]
    a, b = arms
    result = {
        "metric": "assembly_scale",
        "seq_len": SEQ_LEN,
        "arms": arms,
        "time_ratio": {
            k.removesuffix("_s"): round(b[k] / a[k], 2)
            for k in ("pack_chunks_s", "pack_stats_s", "mixture_weights_s")
        },
        "docs_ratio": round(b["n_docs"] / a["n_docs"], 2),
    }
    spark.stop()
    with open(os.path.join(ROOT, "BENCH", "assembly_scale.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
