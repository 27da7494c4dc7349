"""Round-8 phase profiler: decompose the heavy bench rows into stages and
time each with the noop sink (guide §1.4), labelled for the UI (§1.5).

Usage: python BENCH/profile_r08.py [sf_dir] [which ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
WHICH = set(sys.argv[2:])


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, name, thunk):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = thunk()
    dt = time.time() - t0
    print(f"{name:45s} {dt:8.3f} s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def main():
    from illumio_spark.session import build_session
    from illumio_spark.operators import dedup as D
    from illumio_spark.queries.catalog_td import _neardup_corpus

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="profile_r08", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def run_all(tag):
        corpus = _neardup_corpus(spark, SF_DIR)
        if not WHICH or "sigs" in WHICH:
            timed(spark, f"{tag}:band_signatures",
                  lambda: noop(D.band_signatures(_neardup_corpus(spark, SF_DIR))))
        if not WHICH or "star" in WHICH:
            timed(spark, f"{tag}:bands+star_edges",
                  lambda: noop(D._band_star_edges(
                      D.band_signatures(_neardup_corpus(spark, SF_DIR)), "doc_id")))
        if not WHICH or "cc" in WHICH:
            bands = D.band_signatures(corpus).localCheckpoint(eager=True)
            pairs = D._band_star_edges(bands, "doc_id").localCheckpoint(eager=True)
            nodes = bands.select("doc_id").distinct().localCheckpoint(eager=True)
            timed(spark, f"{tag}:cc_only",
                  lambda: noop(D.neardup_components(nodes, pairs)))
        if not WHICH or "compact" in WHICH:
            timed(spark, f"{tag}:compact_full",
                  lambda: noop(D.compact_neardup_frontier(
                      D.band_signatures(_neardup_corpus(spark, SF_DIR)))))
        if not WHICH or "lshpairs" in WHICH:
            timed(spark, f"{tag}:minhash_lsh_pairs",
                  lambda: noop(D.minhash_lsh_pairs(
                      _neardup_corpus(spark, SF_DIR), hash_fn="xxhash64")))
        if not WHICH or "simhash" in WHICH:
            timed(spark, f"{tag}:simhash_neardup",
                  lambda: noop(D.simhash_neardup_pairs(
                      _neardup_corpus(spark, SF_DIR), max_hamming=3,
                      hash_fn="xxhash64")))
        if not WHICH or "sigs_raw" in WHICH:
            from illumio_spark.functions.text import simhash_blocks_df
            timed(spark, f"{tag}:simhash_blocks_df",
                  lambda: noop(simhash_blocks_df(
                      _neardup_corpus(spark, SF_DIR), hash_fn="xxhash64")))

    run_all("cold")
    run_all("warm")
    spark.stop()


if __name__ == "__main__":
    main()
