"""Round-8: per-round timing of the neardup_components loop at sf1.0."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"


def main():
    from pyspark.sql import functions as F

    from illumio_spark.session import build_session
    from illumio_spark.operators import dedup as D
    from illumio_spark.queries.catalog_td import _neardup_corpus

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="profile_cc", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _neardup_corpus(spark, SF_DIR)
    bands = D.band_signatures(corpus).localCheckpoint(eager=True)
    pairs = D._band_star_edges(bands, "doc_id").localCheckpoint(eager=True)
    nodes = bands.select("doc_id").distinct().localCheckpoint(eager=True)
    print("n_nodes", nodes.count(), "n_pairs", pairs.count(), flush=True)

    id_col = "doc_id"
    for rep in range(2):
        t_all = time.time()
        edges = (
            pairs.select(F.col("id_a").alias("__src"), F.col("id_b").alias("__dst"))
            .unionByName(pairs.select(F.col("id_b").alias("__src"), F.col("id_a").alias("__dst")))
            .distinct()
        )
        t0 = time.time()
        edges = edges.localCheckpoint(eager=True)
        print(f"rep{rep} edges ckpt {time.time()-t0:.3f}s", flush=True)
        labels = nodes.select(F.col(id_col), F.col(id_col).alias("component"))
        for it in range(20):
            t0 = time.time()
            neighbor_min = (
                labels.join(edges, labels[id_col] == edges["__src"])
                .groupBy("__dst").agg(F.min("component").alias("__nbmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels[id_col] == neighbor_min["__dst"], "left")
                .select(id_col, F.least(F.col("component"),
                        F.coalesce(F.col("__nbmin"), F.col("component"))).alias("component"))
            )
            lmap = new_labels.select(F.col(id_col).alias("__lid"), F.col("component").alias("__lcomp"))
            new_labels = (
                new_labels.join(lmap, new_labels["component"] == lmap["__lid"], "left")
                .select(id_col, F.least(F.col("component"),
                        F.coalesce(F.col("__lcomp"), F.col("component"))).alias("component"))
            )
            t1 = time.time()
            new_labels = new_labels.localCheckpoint(eager=True)
            t2 = time.time()
            changed = (
                new_labels.alias("n").join(labels.alias("o"), id_col)
                .filter(F.col("n.component") != F.col("o.component")).count()
            )
            t3 = time.time()
            print(f"rep{rep} it{it}: build {t1-t0:.3f}s  ckpt {t2-t1:.3f}s  "
                  f"count {t3-t2:.3f}s  changed={changed}", flush=True)
            labels = new_labels
            if changed == 0:
                break
        print(f"rep{rep} total {time.time()-t_all:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
