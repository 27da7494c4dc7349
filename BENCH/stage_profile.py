"""Per-stage attribution for the 8→32-core compute-scaling residue.

BENCH/BASELINE.md shows compute-only 8→32 efficiency below this box's own
measured string-workload ceiling; this tool answers WHICH stage stops
scaling and why, from Spark's own event log (no UI needed):

  - runs the compute-mode pipeline (same plan as run_scaling.py compute
    mode) at two parallelism levels, one JVM each, warm pass + measured
    pass, with spark.eventLog.enabled
  - parses the event log: per-stage wall time (submission→completion),
    summed task executorRunTime / jvmGCTime / shuffle write+fetch time,
    and the scheduler gap (measured wall − union of stage intervals)
  - prints a side-by-side table + one JSON line; paste into BASELINE.md

Usage: python BENCH/stage_profile.py [--levels 8,32] [--n-conv 300000]
       (internal: --worker --cpus N)
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, n_conv: int) -> None:
    evdir = tempfile.mkdtemp(prefix=f"evlog{cpus}_")
    from illumio_spark.session import build_session
    from illumio_spark.plans.pipeline import (
        fanout_frame,
        ordered_for_sink,
        parse_enrich_format,
    )
    from bench import transcripts_path

    spark = build_session(
        app_name=f"stageprof-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    path, n_turns = transcripts_path(spark, n_conv / 750_000)
    df = spark.read.parquet(path)

    def one_pass() -> None:
        ordered = ordered_for_sink(df, spark.sparkContext.defaultParallelism * 4)
        fan = fanout_frame(parse_enrich_format(spark, ordered))
        fan.write.mode("overwrite").format("noop").save()

    one_pass()  # warm (JIT/codegen)
    boundary = time.time() * 1000
    t0 = time.time()
    one_pass()
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({"cpus": cpus, "n_turns": n_turns, "wall": wall,
                      "boundary_ms": boundary, "evdir": evdir}))


def parse_eventlog(evdir: str, boundary_ms: float) -> dict:
    """Stages of the measured pass (submitted after boundary) with wall and
    summed task metrics."""
    # Spark 4 event logs: either a single file or an eventlog_v2 directory
    # of rolling "events_*" files
    files = []
    for p in glob.glob(os.path.join(evdir, "*")):
        if os.path.isdir(p):
            files += sorted(glob.glob(os.path.join(p, "events_*")))
        else:
            files.append(p)

    def opener(fp, mode):
        return gzip.open(fp, mode) if fp.endswith(".gz") else open(fp, mode)
    stages: dict[int, dict] = {}
    for fp in files:
        with opener(fp, "rt") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    if sub is None or sub < boundary_ms:
                        continue
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split(" at ")[0],
                        "details": si["Stage Name"],
                        "n_tasks": si["Number of Tasks"],
                        "wall_s": (si["Completion Time"] - sub) / 1000,
                        "submit_ms": sub,
                        "complete_ms": si["Completion Time"],
                        "run_s": 0.0, "gc_s": 0.0, "shuf_write_s": 0.0,
                        "fetch_wait_s": 0.0, "deser_s": 0.0,
                    }
                elif kind == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        continue  # TaskEnd after StageCompleted parse order: handled below
    # second pass for task metrics (TaskEnd events precede StageCompleted in
    # the log, so collect them once stage ids are known)
    for fp in files:
        with opener(fp, "rt") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                sid = ev["Stage ID"]
                if sid not in stages:
                    continue
                m = ev.get("Task Metrics") or {}
                st = stages[sid]
                st["run_s"] += m.get("Executor Run Time", 0) / 1000
                st["gc_s"] += m.get("JVM GC Time", 0) / 1000
                st["deser_s"] += m.get("Executor Deserialize Time", 0) / 1000
                sw = m.get("Shuffle Write Metrics") or {}
                st["shuf_write_s"] += sw.get("Shuffle Write Time", 0) / 1e9  # ns
                sr = m.get("Shuffle Read Metrics") or {}
                st["fetch_wait_s"] += sr.get("Fetch Wait Time", 0) / 1000
    return stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--n-conv", type=int, default=300_000)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.n_conv)
        return

    levels = [int(x) for x in args.levels.split(",")]
    runs = {}
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--n-conv", str(args.n_conv)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        info = json.loads(line)
        info["stages"] = parse_eventlog(info["evdir"], info["boundary_ms"])
        runs[cpus] = info

    # align stages across levels by order of submission (identical plan)
    print(f"\n=== per-stage attribution ({levels[0]} vs {levels[1]} cores) ===")
    lo, hi = levels
    lo_stages = sorted(runs[lo]["stages"].values(), key=lambda s: s["submit_ms"])
    hi_stages = sorted(runs[hi]["stages"].values(), key=lambda s: s["submit_ms"])
    rows = []
    hdr = (f"{'stage':<34} {'wall' + str(lo):>8} {'wall' + str(hi):>8} {'speedup':>8} "
           f"{'eff':>6} {'gc%'+str(hi):>7} {'cpu'+str(lo):>8} {'cpu'+str(hi):>8}")
    print(hdr)
    ratio = hi / lo
    for a, b in zip(lo_stages, hi_stages):
        name = a["name"][:34]
        speed = a["wall_s"] / b["wall_s"] if b["wall_s"] else float("inf")
        gc_pct = 100 * b["gc_s"] / b["run_s"] if b["run_s"] else 0
        rows.append({
            "stage": name, f"wall{lo}": round(a["wall_s"], 2), f"wall{hi}": round(b["wall_s"], 2),
            "speedup": round(speed, 2), "efficiency": round(speed / ratio, 3),
            f"gc_pct{hi}": round(gc_pct, 1),
            f"cpu{lo}": round(a["run_s"], 1), f"cpu{hi}": round(b["run_s"], 1),
            f"tasks{lo}": a["n_tasks"], f"tasks{hi}": b["n_tasks"],
        })
        print(f"{name:<34} {a['wall_s']:>8.2f} {b['wall_s']:>8.2f} {speed:>8.2f} "
              f"{speed / ratio:>6.3f} {gc_pct:>7.1f} {a['run_s']:>8.1f} {b['run_s']:>8.1f}")
    for cpus in levels:
        st = runs[cpus]["stages"].values()
        stage_wall = sum(s["wall_s"] for s in st)
        print(f"local[{cpus}]: measured wall {runs[cpus]['wall']:.2f}s, "
              f"Σstage wall {stage_wall:.2f}s, gap {runs[cpus]['wall'] - stage_wall:.2f}s, "
              f"Σtask cpu {sum(s['run_s'] for s in st):.1f}s, "
              f"Σgc {sum(s['gc_s'] for s in st):.1f}s")
    # derived whole-job stats: per-core utilization and CPU inflation —
    # the attribution BASELINE.md renders
    stats = {}
    for cpus in levels:
        st = runs[cpus]["stages"].values()
        cpu = sum(s["run_s"] for s in st)
        stats[cpus] = {
            "wall_s": round(runs[cpus]["wall"], 2),
            "sum_stage_wall_s": round(sum(s["wall_s"] for s in st), 2),
            "gap_s": round(runs[cpus]["wall"] - sum(s["wall_s"] for s in st), 2),
            "task_cpu_s": round(cpu, 1),
            "gc_s": round(sum(s["gc_s"] for s in st), 1),
            "utilization": round(cpu / (runs[cpus]["wall"] * cpus), 3),
        }
    out = {
        "levels": levels, "stages": rows,
        "stats": {str(c): stats[c] for c in levels},
        "cpu_inflation": round(stats[hi]["task_cpu_s"] / stats[lo]["task_cpu_s"], 3),
        "n_turns": runs[lo]["n_turns"],
    }
    with open(os.path.join(REPO, "BENCH", "stage_attribution.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
