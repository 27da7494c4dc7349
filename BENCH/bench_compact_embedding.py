"""Embedding-frontier compaction at 20 k and 200 k vectors (dim 64) —
the similarity-family twin of BENCH/bench_compact_frontier.py. The
frontier state (bucket table + vector table, produced by one
incremental_embedding_neardup run over the corpus) is prep, untimed;
the timed job is the maintenance pass: read both parquet tables,
bucket self-join candidates, exact-cosine verify, pointer-jumping CC,
count canonical + retraction rows.

Corpus shape: 10% of vectors sit in planted near-dup clusters of 5
(base + unit-norm noise at cosine ~0.97), the rest are i.i.d. unit
vectors — so candidate buckets have genuine multi-member structure
without a degenerate all-in-one-bucket corpus.

Usage: python BENCH/bench_compact_embedding.py   (run alone). Writes
BENCH/compact_embedding.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench as B  # noqa: E402

DIM = 64
THRESHOLD = 0.9
# 10 planes → 1024 buckets/table: average bucket ~20 members at 20k /
# ~200 at 200k vectors — genuine multi-member buckets without the
# degenerate 16-bucket (n_planes=4) shape whose self-join would fan out
# quadratically at this corpus size. Still under LSH_LITERAL_BUDGET
# (3*10*64 = 1920), so the JVM literal-expression bucket path runs.
N_PLANES = 10


def synth_vectors(spark, n: int):
    """Distributed deterministic synth (driver createDataFrame of 200k
    vector rows measured minutes of pickle time): each row's vector is
    seeded by its id — clustered ids (first 10%) draw their cluster's
    base (seed = cluster idx) plus per-id noise, the rest i.i.d."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n_clustered = (n // 10) // 5 * 5

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid in pdf["id"]:
                vid = int(vid)
                if vid < n_clustered:
                    base = np.random.Generator(
                        np.random.PCG64(100_000 + vid // 5)
                    ).standard_normal(DIM)
                    noise = np.random.Generator(
                        np.random.PCG64(200_000 + vid)
                    ).standard_normal(DIM)
                    # noise norm ~0.15 (standard_normal has norm ~sqrt(dim)):
                    # member-to-member cosine ~0.978, safely over threshold
                    v = base / np.linalg.norm(base) + (
                        0.15 / np.sqrt(DIM)
                    ) * noise
                else:
                    v = np.random.Generator(
                        np.random.PCG64(300_000 + vid)
                    ).standard_normal(DIM)
                out.append(v / np.linalg.norm(v))
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": out})

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    return spark.range(n).mapInPandas(gen, schema=schema)


def run_arm(spark, n: int) -> dict:
    from illumio_spark.operators import similarity as SIM

    df = synth_vectors(spark, n).localCheckpoint(eager=True)
    kw = dict(threshold=THRESHOLD, n_planes=N_PLANES, dim=DIM, n_tables=3)
    kept, bk, vc = SIM.incremental_embedding_neardup(df, None, None, **kw)
    base = tempfile.mkdtemp(prefix=f"compact_emb_m{n}_")
    bk.write.mode("overwrite").parquet(f"{base}/buckets")
    vc.write.mode("overwrite").parquet(f"{base}/vecs")
    kept.select("vec_id").write.mode("overwrite").parquet(f"{base}/emitted")

    out: dict = {"n_vecs": n}
    t0 = time.time()
    buckets = spark.read.parquet(f"{base}/buckets")
    vecs = spark.read.parquet(f"{base}/vecs")
    emitted = spark.read.parquet(f"{base}/emitted")
    canonical, retractions = SIM.compact_embedding_frontier(
        buckets, vecs, emitted, threshold=THRESHOLD
    )
    out["canonical_rows"] = canonical.count()
    out["retraction_rows"] = retractions.count()
    out["compact_s"] = round(time.time() - t0, 3)
    out["bucket_rows"] = buckets.count()
    return out


def main() -> None:
    from illumio_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with B.StderrCapture():
        spark = build_session(
            app_name="bench_compact_embedding", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
        spark.sparkContext.setLogLevel("ERROR")
        disk0 = round(B.disk_probe_mb_s())
        run_arm(spark, 2000)  # warm every plan shape
        arms = [run_arm(spark, 20_000), run_arm(spark, 200_000)]
        disk1 = round(B.disk_probe_mb_s())
        spark.stop()

    a, b = arms
    result = {
        "metric": "compact_embedding_scale",
        "arms": arms,
        "data_ratio": round(b["n_vecs"] / a["n_vecs"], 2),
        "time_ratio_200k_over_20k": round(b["compact_s"] / a["compact_s"], 2),
        "dim": DIM,
        "threshold": THRESHOLD,
        "cpus": int(cpus),
        "disk_mb_s_before": disk0,
        "disk_mb_s_after": disk1,
    }
    with open(os.path.join(ROOT, "BENCH", "compact_embedding.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
