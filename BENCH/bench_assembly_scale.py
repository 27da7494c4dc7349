"""Corpus-assembly operators off the fixed-overhead floor: pack_chunks
(per-stratum window cumsum), mixture_weights (groupBy + 1-row
broadcast), and the late-r6 five — apply_mixture (map-side explode),
select_token_budget (window prefix scan), chunk_documents (map-only
explode+slice), select_top_frac (two windows, one shuffle),
shuffle_shards (map-only hash tag) — at 50.8 k vs 508 k documents,
same corpus constructor as BENCH/bench_dedup_scale.py so the arms are
comparable across files.

All should be ~linear: nothing here shuffles more than once and the
map-only ops not at all. Anything super-linear gets an attribution
note in BENCH/NOTES.md.

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

    from illumio_spark.operators.curation import (
        apply_mixture,
        chunk_documents,
        select_token_budget,
        select_top_frac,
        shuffle_shards,
    )

    weights = {f"src{i}": (i % 4) * 0.75 for i in range(N_STRATA)}
    t0 = time.time()
    out["apply_mixture_rows"] = apply_mixture(corpus, weights).count()
    out["apply_mixture_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    out["token_budget_rows"] = select_token_budget(corpus, 50_000).count()
    out["token_budget_s"] = round(time.time() - t0, 3)

    # 16-token windows so the synthetic ~56-token docs genuinely
    # multi-chunk (~4-5x row fan-out) — at window 256 every doc is a
    # single chunk and the explode path goes unexercised
    t0 = time.time()
    out["chunk_rows"] = chunk_documents(corpus, 16, overlap=4).count()
    out["chunk_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    scored = corpus.withColumn("n_chars", F.length("text"))
    out["top_frac_rows"] = select_top_frac(scored, 0.3, "n_chars").count()
    out["top_frac_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    sh = shuffle_shards(corpus.select("source", "doc_id"), 1024)
    r = sh.agg(
        F.countDistinct("shard").alias("n_shards"),
        F.max("sort_key").alias("mx"),
    ).first()
    out["shuffle_shards_n"] = int(r.n_shards)
    out["shuffle_shards_s"] = round(time.time() - t0, 3)

    # sharded WRITE (r6 task 6): the one real shuffle in the assembly
    # family — the CLI --shards materialization (repartition(n, shard) →
    # sortWithinPartitions → partitionBy write), measured end to end
    # including the parquet write, with files-per-shard and per-file
    # sort order verified on the output
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    n_shards = 64
    t0 = time.time()
    tagged = shuffle_shards(corpus, n_shards, key_cols=("source", "doc_id"))
    outdir = tempfile.mkdtemp(prefix=f"shardwrite_m{mult}_")
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(outdir)
    )
    out["sharded_write_s"] = round(time.time() - t0, 3)
    shard_dirs = glob.glob(outdir + "/shard=*")
    parts = glob.glob(outdir + "/shard=*/*.parquet")
    out["sharded_write_shards"] = len(shard_dirs)
    out["sharded_write_files_per_shard"] = round(len(parts) / len(shard_dirs), 2)
    bad = 0
    for p in parts[:n_shards]:
        keys = pq.read_table(p, columns=["sort_key"])["sort_key"].to_pylist()
        if keys != sorted(keys):
            bad += 1
    out["sharded_write_unsorted_files"] = bad
    out["sharded_write_rows"] = spark.read.parquet(outdir).count()
    shutil.rmtree(outdir)
    return out


def main() -> None:
    from illumio_spark.session import build_session

    import bench as B

    spark = build_session(app_name="assembly_scale", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    disk0 = round(B.disk_probe_mb_s())
    arms = [run_arm(spark, 1), run_arm(spark, 100)]
    disk1 = round(B.disk_probe_mb_s())
    a, b = arms
    result = {
        "metric": "assembly_scale",
        "seq_len": SEQ_LEN,
        "disk_mb_s_before": disk0,
        "disk_mb_s_after": disk1,
        "arms": arms,
        "time_ratio": {
            k.removesuffix("_s"): round(b[k] / a[k], 2)
            for k in (
                "pack_chunks_s", "pack_stats_s", "mixture_weights_s",
                "apply_mixture_s", "token_budget_s", "chunk_s",
                "top_frac_s", "shuffle_shards_s", "sharded_write_s",
            )
        },
        "docs_ratio": round(b["n_docs"] / a["n_docs"], 2),
    }
    spark.stop()
    with open(os.path.join(ROOT, "BENCH", "assembly_scale.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
