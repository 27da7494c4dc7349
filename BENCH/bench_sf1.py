"""One sf1.0 bench point (VERDICT r4 task 3): ~13 M turns through
pipeline_e2e plus the dedup family at 10x the usual corpus, measured in
the SAME session as the sf0.1 arm so the 10x scaling ratio is coherent
(same disk conditions, same JIT state, same configs as bench.py).

Inputs are synthesized deterministically (no external data): transcripts
via bench.transcripts_path (the cached synth corpus the normal bench
uses, at sf=1.0), documents by replicating the sf0.1 documents table
`mult` times with per-replica text variation plus proportional exact-dup
and near-dup injection — the same signal shape catalog_td's corpora use.

Usage: python BENCH/bench_sf1.py   (≈15 min: synth + 2 warm + timed runs)
Writes BENCH/sf1_point.json and prints one JSON line per arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench as B  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DOCS_V = 1


def docs_corpus(spark, mult: int):
    """sf0.1 documents x mult with injected duplicates, cached as parquet.

    Per replica r>0 every text gets a ' variant-r' suffix (unique content,
    so the dup GROUPS stay proportional instead of becoming mult-way);
    then doc_id%10000<50 rows duplicate exactly (+10M ids) and
    50<=doc_id%10000<80 rows near-duplicate with a trailing suffix
    (+20M ids) — mirroring catalog_td._dup_corpus/_neardup_corpus."""
    path = os.path.join(B.CACHE_DIR, f"documents_v{DOCS_V}_mult{mult}.parquet")
    if not os.path.exists(path):
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
            "doc_id", "text"
        )
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        big = base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"),
                                   F.concat(F.lit("variant-"), F.col("rep"))))
            .alias("text"),
        )
        key = F.col("doc_id") % 10_000
        dups = big.filter(key < 50).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        near = big.filter((key >= 50) & (key < 80)).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" trailing near dup suffix")).alias("text"),
        )
        big.unionByName(dups).unionByName(near).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def dedup_suite(spark, corpus, eval_df):
    """(name -> zero-arg thunk -> DataFrame) for the dedup family,
    engine-default hashes. Thunks, not DataFrames: compaction's CC
    executes eagerly at CONSTRUCTION (per-round count() + checkpoints),
    so building it outside the caller's timer would bench a no-op
    traversal of the checkpointed labels."""
    from illumio_spark.operators import dedup as D

    return {
        "td_exact_dedup": lambda: D.exact_dedup_keepers(corpus).filter(
            F.col("n_copies") > 1
        ),
        "td_minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(
            corpus, hash_fn="xxhash64"
        ),
        "td_decontaminate": lambda: D.decontaminate(corpus, eval_df, k=13),
        # r7: full-frontier compaction (star-edge CC from the band table)
        # at the 10x corpus — the O(history) maintenance job, in-driver
        "td_compact_frontier": lambda: D.compact_neardup_frontier(
            D.band_signatures(corpus, hash_fn="xxhash64")
        ),
    }


def run_arm(spark, label: str, sf: float, mult: int, eval_df) -> dict:
    out: dict = {"label": label, "sf": sf}
    corpus = docs_corpus(spark, mult)
    out["n_docs"] = corpus.count()

    elapsed, n_turns = B.bench_pipeline(spark, sf)  # 2 full warm runs inside
    out["pipeline_e2e_s"] = round(elapsed, 3)
    out["pipeline_turns"] = n_turns
    out["turns_per_sec"] = round(n_turns / elapsed, 1)

    for name, thunk in dedup_suite(spark, corpus, eval_df).items():
        t0 = time.time()
        thunk().write.mode("overwrite").format("noop").save()
        out[name + "_s"] = round(time.time() - t0, 3)
    return out


def main():
    from illumio_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with B.StderrCapture() as cap:
        spark = build_session(
            app_name="bench_sf1", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
        spark.sparkContext.setLogLevel("ERROR")
        disk0 = round(B.disk_probe_mb_s())

        eval_df = (
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .filter(F.col("doc_id") < 500)
            .select("doc_id", "text")
        )
        # warm the dedup plan shapes once so both timed arms are steady-state
        for thunk in dedup_suite(spark, docs_corpus(spark, 1), eval_df).values():
            thunk().write.mode("overwrite").format("noop").save()

        arms = [
            run_arm(spark, "sf0.1", 0.1, 1, eval_df),
            run_arm(spark, "sf1.0", 1.0, 10, eval_df),
        ]
        disk1 = round(B.disk_probe_mb_s())
        spark.stop()

    a, b = arms
    ratios = {
        k[:-2]: round(b[k] / a[k], 2)
        for k in a
        if k.endswith("_s") and a[k] > 0
    }
    result = {
        "metric": "sf1_scaling_point",
        "arms": arms,
        "data_ratio_turns": round(b["pipeline_turns"] / a["pipeline_turns"], 2),
        "data_ratio_docs": round(b["n_docs"] / a["n_docs"], 2),
        "time_ratios_sf1_over_sf01": ratios,
        "cpus": int(cpus),
        "disk_mb_s_before": disk0,
        "disk_mb_s_after": disk1,
        "codegen_fallback": cap.codegen_fallback(),
    }
    with open(os.path.join(ROOT, "BENCH", "sf1_point.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
