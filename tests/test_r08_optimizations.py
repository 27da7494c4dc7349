"""Focused tests for the round-8 optimization internals.

Each r8 change keeps a declared query's output bit-identical; these tests
pin the internal contracts the optimizations rely on:
  - star-contraction CC: correct labels on adversarial graph shapes and
    tolerance of duplicate input pairs (the up-front distinct was removed);
  - simhash signature canonicalization: pair output equals the brute-force
    all-pairs hamming computation on a duplicate-heavy corpus;
  - py_strip edge probe: byte-equality with str.strip() on edge cases that
    exercise the probe (whitespace edges, interior-only whitespace,
    unicode whitespace, empty/null);
  - parallelize_scan: repartitions an under-parallel narrow scan, passes a
    shuffle-bearing lineage through without launching eager jobs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_cc_random_permuted_path_and_dup_pairs(spark):
    # a 600-node path with randomly permuted ids (the shape where plain
    # min-label propagation needs ~hundreds of rounds), fed with each pair
    # DUPLICATED — neardup_components no longer pre-distincts its input,
    # so duplicate tolerance is part of the contract
    from illumio_spark.operators.dedup import neardup_components

    n = 600
    perm = list(range(n))
    random.Random(7).shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges + edges, "id_a long, id_b long")
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    comp = neardup_components(nodes, pairs, "doc_id")
    rows = comp.collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)


def test_cc_two_components_and_reversed_pairs(spark):
    # pair orientation must not matter (id_a > id_b rows are canonicalized)
    from illumio_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(5, 1), (3, 5), (9, 7)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 3, 5, 7, 9, 11)], "doc_id long"
    )
    comp = {r.doc_id: r.component for r in neardup_components(nodes, pairs).collect()}
    assert comp[1] == comp[3] == comp[5] == 1
    assert comp[7] == comp[9] == 7
    assert comp[11] == 11


def test_simhash_canonicalization_equals_brute_force(spark):
    # duplicate-heavy corpus: 3 base docs, each replicated several times,
    # plus small perturbations — the signature-level join must reproduce
    # exactly the all-pairs hamming<=3 result (including hamming values)
    from illumio_spark.functions.text import simhash_blocks_df
    from illumio_spark.operators.dedup import simhash_neardup_pairs

    rng = random.Random(3)
    words = [f"w{i}" for i in range(80)]
    bases = [" ".join(rng.choice(words) for _ in range(40)) for _ in range(3)]
    rows = []
    doc_id = 0
    for b in bases:
        for _ in range(6):  # identical replicas
            rows.append((doc_id, b)); doc_id += 1
        rows.append((doc_id, b + " perturbation token")); doc_id += 1
    for _ in range(20):  # unrelated noise docs
        rows.append((doc_id, " ".join(rng.choice(words) for _ in range(40))))
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(df, max_hamming=3, hash_fn="xxhash64").collect()
    }

    sigs = simhash_blocks_df(df, hash_fn="xxhash64").collect()
    sig = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in sigs}
    ids = sorted(sig)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(sig[a][k] ^ sig[b][k]).count("1") for k in range(4))
            if h <= 3:
                want.add((a, b, h))
    assert got == want and len(want) >= 15 * 3  # replicas alone give C(7,2)*3


def test_py_strip_edge_probe_byte_equality(spark):
    from illumio_spark.functions.format import py_strip

    cases = [
        "plain",
        "  ascii edges  ",
        "\tinterior ok here\n",
        "inner   spaces only",
        "\xa0unicode nbsp edge",
        "\u1680ogham edge\u1680",
        "\u2003em-space edge\u2003",
        "\x1cfile-sep\x1f",
        "",
        " ",
        "\u3000",
        "a",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r.out for r in df.select(py_strip(F.col("s")).alias("out")).collect()]
    want = [c.strip() if isinstance(c, str) else None for c in cases]
    assert got == want


def test_parallelize_scan_narrow_vs_shuffled(spark, tmp_path):
    from illumio_spark.functions import parallelize_scan

    p = str(tmp_path / "one_file.parquet")
    spark.range(1000).selectExpr("id", "id * 2 as v").coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    out = parallelize_scan(narrow, F.col("id"))
    assert "repartitionbyexpression" in out._jdf.queryExecution().analyzed().toString().lower()

    # shuffle-bearing lineage: passes through unchanged AND the probe
    # launches no eager jobs (df.rdd on an AQE plan would execute stages)
    sc = spark.sparkContext
    shuffled = narrow.groupBy((F.col("id") % 10).alias("k")).count()
    sc.setJobGroup("ps-probe", "parallelize_scan probe")
    try:
        out2 = parallelize_scan(shuffled, F.col("k"))
        jobs = sc.statusTracker().getJobIdsForGroup("ps-probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []
    assert out2 is shuffled
