"""Dedup family off the fixed-overhead floor (VERDICT r5 task 5): the
sf1.0 point showed 50.8 k docs is still overhead-bound, so this benches
the four headline dedup operators at 50.8 k vs **508 k** documents
(mult=100 of the sf0.1 table, same replica/dup/near-dup injection shape
as bench_sf1.docs_corpus) — the first corpus where the LSH band shuffles
and the verbatim M² fan-out dominate the runtime.

Per VERDICT: anything super-linear gets an attribution note, and the
verbatim ExactSubstr signal is measured BOTH uncapped and with the
stop-shingle mitigation (max_doc_freq) — at mult=100 every surviving
base-doc window is shared by ~100 replicas, i.e. the adversarial
boilerplate case the mitigation exists for. k=20 for the verbatim arms
(corpus averages 54 tokens/doc; k=50 would leave most docs windowless).

Usage: python BENCH/bench_dedup_scale.py   (runs both arms in ONE
session: same disk, same JIT state). Writes BENCH/dedup_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench as B  # noqa: E402
import bench_sf1 as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VERBATIM_K = 20
STOP_DF = 50  # drop windows shared by > 50 docs (replica groups are ~100)


def suite(spark, corpus, eval_df) -> dict:
    from illumio_spark.operators import dedup as D

    return {
        "td_minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(corpus, hash_fn="xxhash64"),
        "td_decontaminate": lambda: D.decontaminate(corpus, eval_df, k=13),
        "neardup_keepers": lambda: D.neardup_keepers(corpus, hash_fn="xxhash64"),
        "verbatim_uncapped": lambda: D.verbatim_overlap_pairs(corpus, k=VERBATIM_K),
        "verbatim_stopshingle": lambda: D.verbatim_overlap_pairs(
            corpus, k=VERBATIM_K, max_doc_freq=STOP_DF
        ),
    }


def run_arm(spark, mult: int, eval_df) -> dict:
    corpus = S.docs_corpus(spark, mult)
    out: dict = {"mult": mult, "n_docs": corpus.count()}
    for name, build in suite(spark, corpus, eval_df).items():
        t0 = time.time()
        n = build().count()  # full compute; row count doubles as the fan-out probe
        out[name + "_s"] = round(time.time() - t0, 3)
        out[name + "_rows"] = n
    return out


def main():
    from illumio_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with B.StderrCapture() as cap:
        spark = build_session(
            app_name="bench_dedup_scale", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
        spark.sparkContext.setLogLevel("ERROR")
        disk0 = round(B.disk_probe_mb_s())
        eval_df = (
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .filter(F.col("doc_id") < 500)
            .select("doc_id", "text")
        )
        # warm every plan shape on the 1× corpus first
        for build in suite(spark, S.docs_corpus(spark, 1), eval_df).values():
            build().count()
        arms = [run_arm(spark, 10, eval_df), run_arm(spark, 100, eval_df)]
        disk1 = round(B.disk_probe_mb_s())
        spark.stop()

    a, b = arms
    ratios = {
        k[:-2]: round(b[k] / a[k], 2) for k in a if k.endswith("_s") and a[k] > 0
    }
    result = {
        "metric": "dedup_scale_point",
        "arms": arms,
        "data_ratio_docs": round(b["n_docs"] / a["n_docs"], 2),
        "time_ratios_508k_over_50k": ratios,
        "verbatim_k": VERBATIM_K,
        "stop_doc_freq": STOP_DF,
        "cpus": int(cpus),
        "disk_mb_s_before": disk0,
        "disk_mb_s_after": disk1,
        "codegen_fallback": cap.codegen_fallback(),
    }
    with open(os.path.join(ROOT, "BENCH", "dedup_scale.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
