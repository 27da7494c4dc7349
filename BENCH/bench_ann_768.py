"""Real-dimension ANN benchmark (VERDICT r3 task 7): lsh_topk at dim=768.

The driver-oracled queries exercise the dim=64 literal-expression bucket
path; the 100 TB design point is real embedding dims (768+), where bucket
assignment switches to ONE numpy matmul per Arrow batch
(`lsh_buckets_pandas_multi`, engaged above LSH_LITERAL_BUDGET plane
literals). This bench proves that path at scale-shape: synthetic unit
vectors at dim=768, n_tables=8, against brute-force cosine as the
wall-clock reference, at two core counts for the scaling signal.

Usage: python BENCH/bench_ann_768.py [--n 20000] [--dim 768] [--cpus 8,32]
Prints one JSON line per (cpus, variant).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, n: int, dim: int, n_queries: int) -> None:
    import numpy as np

    from illumio_spark.operators import similarity as SIM
    from illumio_spark.session import build_session

    spark = build_session(
        app_name=f"ann768-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.Generator(np.random.PCG64(1234))
    mat = rng.standard_normal((n, dim))
    # plant TRUE neighbors: at dim=768 random vectors concentrate at
    # cos≈0±1/sqrt(dim) (no meaningful nearest neighbors exist — measured
    # recall on pure-random data is ~0 for ANY ANN method), so each query
    # gets 10 planted neighbors at cos≈0.9; recall@10 = finding them
    n_q = n_queries
    for qi in range(n_q):
        for j in range(10):
            idx = n_q + qi * 10 + j
            mat[idx] = mat[qi] + 0.5 * rng.standard_normal(dim)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(int(i), mat[i].tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        max(cpus, 8)
    )
    emb.write.mode("overwrite").format("noop").save()  # materialize input cost once
    qs = emb.filter(f"vec_id < {n_queries}").selectExpr(
        "vec_id as qid", "embedding as qe"
    )

    n_planes = int(os.environ.get("ANN_BENCH_PLANES", "12"))
    n_tables = 8
    assert n_planes * dim > SIM.LSH_LITERAL_BUDGET, "must engage the matmul path"

    out = {"cpus": cpus, "n": n, "dim": dim}
    lsh = SIM.lsh_topk(emb, qs, k=10, n_planes=n_planes, dim=dim, n_tables=n_tables)
    # engine-default re-rank: numpy batch instead of the interpreted
    # aggregate expression walking 768 elements per candidate row
    lsh_mm = SIM.lsh_topk(
        emb, qs, k=10, n_planes=n_planes, dim=dim, n_tables=n_tables,
        score="pandas",
    )
    ivf = SIM.ivf_topk(emb, qs, k=10, n_centroids=64, n_probe=8)
    ivf_mm = SIM.ivf_topk(
        emb, qs, k=10, n_centroids=64, n_probe=8, score="pandas"
    )
    brute = SIM.brute_force_topk(emb, qs, k=10)
    for name, df in {
        "lsh_topk_768": lsh, "lsh_topk_768_pandas": lsh_mm,
        "ivf_topk_768": ivf, "ivf_topk_768_pandas": ivf_mm,
        "brute_force_768": brute,
    }.items():
        df.write.mode("overwrite").format("noop").save()  # warm (JIT + python workers)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    # recall@10 of each approximate path vs exact brute force
    truth = {(r.qid, r.neighbor_id) for r in brute.collect()}
    for name, df in {"lsh": lsh, "ivf": ivf}.items():
        approx = {(r.qid, r.neighbor_id) for r in df.collect()}
        out[f"recall_{name}"] = round(len(truth & approx) / len(truth), 3)
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--worker-cpus", type=int)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker_cpus, args.n, args.dim, args.n_queries)
        return

    for c in [int(x) for x in args.cpus.split(",")]:
        subprocess.run(  # one JVM per level, same as run_scaling.py
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--worker-cpus", str(c), "--n", str(args.n), "--dim", str(args.dim),
             "--n-queries", str(args.n_queries)],
            check=True,
        )


if __name__ == "__main__":
    main()
