"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the same cached input
(BASELINE.json guidance). Each level runs in its own subprocess (one JVM
per master); throughput is steady-state (warm run measured after two full
warm passes, like a long-lived cluster job).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python BENCH/run_scaling.py [--n-conv 75000] [--levels 8,32]
       (internal per-level worker: --worker --cpus N)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, n_conv: int) -> None:
    from illumio_spark.session import build_session
    from illumio_spark.plans.pipeline import run_pipeline
    from illumio_spark.sources.tableio import TableIO
    from bench import transcripts_path

    spark = build_session(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    path, n_turns = transcripts_path(spark, n_conv / 750_000)
    df = spark.read.parquet(path)
    times = []
    for i in range(4):  # 3 warm + 1 measured
        out = tempfile.mkdtemp(prefix=f"scal{cpus}_")
        t0 = time.time()
        run_pipeline(spark, df, io=TableIO(out), run_id="scal")
        times.append(time.time() - t0)
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    print(json.dumps({"cpus": cpus, "n_turns": n_turns, "sec": times[-1], "all_sec": times}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, default=300_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.n_conv)
        return

    results = {}
    for cpus in [int(x) for x in args.levels.split(",")]:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--n-conv", str(args.n_conv)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = min(results), max(results)
    r_lo, r_hi = results[lo], results[hi]
    tp = {c: r["n_turns"] / r["sec"] for c, r in results.items()}
    eff = (tp[hi] / tp[lo]) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "levels": {str(c): {"sec": round(r["sec"], 2), "turns_per_sec": round(tp[c], 1)}
                   for c, r in results.items()},
        "n_turns": r_lo["n_turns"],
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — scaling & throughput baseline

## Scaling efficiency (north rule: ≥ 0.8 from N to 4N)

Sandbox stand-in per BASELINE.json: same job, same input, two parallelism
levels (one JVM per level, steady-state measurement after 2 warm passes).

| parallelism | wall (s) | turns/sec |
|---|---|---|
| local[{lo}] | {r_lo['sec']:.2f} | {tp[lo]:,.0f} |
| local[{hi}] | {r_hi['sec']:.2f} | {tp[hi]:,.0f} |

- input: {r_lo['n_turns']:,} synthetic transcript turns (seed 42, hot-conv 20%)
- pipeline: parse → enrich → route → aggregate → partitioned sink write
  (one pass, observe-based rollups)
- **efficiency = ({tp[hi]:,.0f} / {tp[lo]:,.0f}) / {hi//lo} = {eff:.3f}**
  (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

## Reference comparison

The reference (paraserv/illumio) is rate-capped at 250–1,000 msg/s
single-threaded (BASELINE.md); this pipeline sustains {tp[hi]:,.0f} turns/s
on one node — ≈ {tp[hi]/1000:,.0f}× the reference ceiling — while adding
byte-equal routed-row formatting, dead-letter routing, rollups and
checkpoints in the same pass.

Regenerate: `python BENCH/run_scaling.py`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
