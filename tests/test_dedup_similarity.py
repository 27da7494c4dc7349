"""Unit tests for dedup + similarity operators (SURVEY.md §5.1 style:
tiny in-memory DataFrames vs hand-computed expectations)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from illumio_spark.operators import dedup as D
from illumio_spark.operators import similarity as SIM
from illumio_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog tonight ok"),  # near dup
        (3, "completely different words about spark shuffles and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r.keeper: r.n_copies for r in D.exact_dedup_keepers(docs).collect()}
    assert out[0] == 2  # docs 0,1 collapse; keeper = min id
    assert out[2] == 1 and out[3] == 1


def test_ngram_jaccard_hand_computed(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(0, 1)] == 1.0
    # doc2 = doc0 + 1 word: shingles 8 vs 9, common 8 → 8/9
    assert abs(pairs[(0, 2)] - round(8 / 9, 6)) < 1e-9
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    sh = D.word_shingles(F.col("text"), 3)
    sigs = docs.select("doc_id", *D.minhash_signature(sh))
    sigs = sigs.select("*", *D.lsh_bands())
    pairs = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in pairs  # exact dup always collides on every band
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_df_equals_column_version(spark, docs):
    # the explode+codegen scale path must produce identical blocks to the
    # per-row column expression (and both to the DuckDB oracle, via selfcheck)
    from pyspark.sql import functions as F

    docs2 = docs.union(spark.createDataFrame([(9, ""), (10, "one")], "doc_id long, text string"))
    col_ver = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in docs2.select(
            "doc_id", *[b.alias(f"b{k}") for k, b in enumerate(TX.simhash_blocks(F.col("text")))]
        ).collect()
    }
    df_ver = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in TX.simhash_blocks_df(docs2).collect()
    }
    assert df_ver == col_ver and len(df_ver) == 6


def test_simhash_hamming(spark, docs):
    sig = docs.withColumn("sig", TX.simhash(F.col("text"))).collect()
    s = {r.doc_id: r.sig for r in sig}
    assert s[0] == s[1]  # identical text → identical signature
    ham02 = bin((s[0] ^ s[2]) & ((1 << 64) - 1)).count("1")
    ham03 = bin((s[0] ^ s[3]) & ((1 << 64) - 1)).count("1")
    assert ham02 < ham03  # near dup closer than unrelated


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near dup of 0
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb):
    qs = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = SIM.brute_force_topk(emb, qs, k=5).collect()
    assert len(out) == 5
    by_rank = {r.rank: r.neighbor_id for r in out}
    assert by_rank[1] == 1  # the injected near-duplicate is the top neighbor


def test_lsh_bucket_paths_agree(emb):
    # the literal-fold JVM path and the matmul pandas path must assign
    # identical buckets (same seeded planes, sign test on the same doubles)
    from pyspark.sql import functions as F

    v = F.col("embedding").cast("array<double>")
    out = emb.select(
        "vec_id",
        SIM.lsh_bucket_column(v, 4, 16, SIM.LSH_SEED).alias("jvm"),
        SIM.lsh_bucket_pandas(v, 4, 16, SIM.LSH_SEED).alias("np"),
    ).collect()
    assert all(r.jvm == r.np for r in out) and len(out) == 60


def test_lsh_topk_recall(emb):
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = SIM.brute_force_topk(emb, qs, k=5).collect()
    approx = SIM.lsh_topk(emb, qs, k=5, n_planes=2, dim=16, n_tables=4).collect()
    exact_set = {(r.qid, r.neighbor_id) for r in exact}
    approx_set = {(r.qid, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # 4 tables × 2 planes (OR-construction)
    # multi-table probing must catch the near-dup pair even when one table
    # splits it across a hyperplane boundary
    assert (0, 1) in approx_set


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    """Golden-style corpus: varied base docs + injected exact/near dups —
    the shape the td_* bench/driver queries run on."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(120):
        n = rng.randint(40, 80)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    # near dups with shingle-jaccard ≳ 0.85 — clearly above the 2-rows ×
    # 4-bands LSH threshold, so BOTH hash backends must surface them.
    # (Borderline-jaccard pairs may legitimately differ between hash
    # backends — LSH candidate membership is hash-dependent at the margin;
    # downstream jaccard/hamming verification absorbs that.)
    for i in range(25):
        rows.append((1000000 + i, rows[i][1] + " zq"))
    for i in range(25, 40):  # exact dups
        rows.append((1000000 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_xxhash64_same_pairs(neardup_corpus):
    """The engine-internal xxhash64 fast path must find the same near-dup
    pair set as the oracle-parity md5 path on the golden-style corpus."""
    md5_pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(neardup_corpus, hash_fn="md5").collect()}
    xx_pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(neardup_corpus, hash_fn="xxhash64").collect()}
    assert (0, 1000000) in xx_pairs  # near dup found
    assert (25, 1000025) in xx_pairs  # exact dup found
    assert xx_pairs == md5_pairs


def test_simhash_neardup_xxhash64_backend(neardup_corpus):
    """SimHash signatures are defined BY the chosen hash, so near-dup pairs
    at the hamming margin legitimately differ between backends. What both
    backends must guarantee: exact dups at hamming 0, zero false positives
    among unrelated docs, and high recall on the injected near dups."""
    md5_pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_neardup_pairs(neardup_corpus, hash_fn="md5").collect()
    }
    xx_pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_neardup_pairs(neardup_corpus, hash_fn="xxhash64").collect()
    }
    exact = {(i, 1000000 + i) for i in range(25, 40)}
    near = {(i, 1000000 + i) for i in range(25)}
    for pairs in (md5_pairs, xx_pairs):
        assert all(pairs.get(p) == 0 for p in exact)  # exact dups: hamming 0, any hash
        assert set(pairs) <= exact | near  # no false positives across random docs
        # one-token perturbation flips ~3-4 of 64 bits in expectation, so
        # hamming<=3 recall caps ~70% — the bound checks both backends sit
        # there, not that simhash is a perfect near-dup detector
        assert len(set(pairs) & near) >= 0.6 * len(near)


def test_minhash_explode_path_equals_column_path(docs, spark):
    """The explode+codegen signature builder must produce the IDENTICAL
    md5 signatures as the per-row array_min(transform(...)) column version
    (and both equal the DuckDB oracle, via selfcheck), including null
    signatures for docs with fewer than k tokens."""
    docs2 = docs.union(spark.createDataFrame([(9, ""), (10, "one two")], "doc_id long, text string"))
    col_ver = {
        r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
        for r in docs2.select(
            "doc_id", *D.minhash_signature(D.word_shingles(F.col("text"), 3), 4)
        ).collect()
    }
    df_ver = {
        r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
        for r in D.minhash_signatures_df(docs2, n_hashes=4).collect()
    }
    assert df_ver == col_ver
    assert df_ver[9] == (None, None, None, None)  # empty text → null signature
    assert df_ver[10] == (None, None, None, None)  # < k tokens → null signature


def test_minhash_xxhash64_null_for_empty_docs(spark):
    """xxhash64 hashes a bare salt when the input is null — the fast path
    must still yield null signatures for shingle-less docs."""
    df = spark.createDataFrame([(0, ""), (1, "a b c d")], "doc_id long, text string")
    out = {r.doc_id: r.mh0 for r in D.minhash_signatures_df(df, n_hashes=2, hash_fn="xxhash64").collect()}
    assert out[0] is None and out[1] is not None


def test_multi_table_pandas_buckets_agree(emb):
    """The single-UDF all-tables matmul path must assign the same
    (table, bucket) rows as the per-table JVM literal-fold path."""
    from illumio_spark.operators.similarity import LSH_SEED, _bucketed_long
    import illumio_spark.operators.similarity as S

    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    jvm = {(r.vec_id, r.tbl, r.bucket)
           for r in _bucketed_long(base, "vec_id", "v", 4, 16, 3).collect()}
    old = S.LSH_LITERAL_BUDGET
    S.LSH_LITERAL_BUDGET = 0  # force the multi-table pandas path
    try:
        np_rows = {(r.vec_id, r.tbl, r.bucket)
                   for r in _bucketed_long(base, "vec_id", "v", 4, 16, 3).collect()}
    finally:
        S.LSH_LITERAL_BUDGET = old
    assert np_rows == jvm


def test_hashing_embed_text_to_ann_end_to_end(neardup_corpus, spark):
    """Raw text → REAL hashing-trick embedding → calibrated LSH near-dup:
    the injected near-duplicate texts must surface as high-cosine pairs
    with zero false positives among unrelated random docs."""
    emb = SIM.hashing_embed(neardup_corpus, dim=64)
    row = emb.filter(F.col("doc_id") == 0).first()
    assert len(row["embedding"]) == 64
    assert abs(sum(x * x for x in row["embedding"]) - 1.0) < 1e-9  # unit norm

    pairs = {
        (r.id_a, r.id_b)
        for r in SIM.lsh_neardup_pairs(
            emb, "doc_id", "embedding", threshold=0.9, n_planes=8, dim=64, n_tables=9
        ).collect()
    }
    exact = {(i, 1000000 + i) for i in range(25, 40)}
    near = {(i, 1000000 + i) for i in range(25)}
    assert exact <= pairs  # exact dup texts → identical embeddings → cos 1
    assert len(pairs & near) >= 0.9 * len(near)  # one-token perturbation
    assert pairs <= exact | near  # random docs never reach cos 0.9


def test_hashing_embed_deterministic_and_empty(spark):
    df = spark.createDataFrame([(0, "a b a c"), (1, ""), (2, None)], "doc_id long, text string")
    out1 = {r.doc_id: r.embedding for r in SIM.hashing_embed(df, dim=8).collect()}
    out2 = {r.doc_id: r.embedding for r in SIM.hashing_embed(df, dim=8).collect()}
    assert out1 == out2  # deterministic
    assert out1[1] == [0.0] * 8 and out1[2] == [0.0] * 8  # zero-token → zero vector


def test_decontaminate_13gram_rule(spark):
    base = " ".join(f"w{j}" for j in range(13))  # exactly one 13-gram
    train = spark.createDataFrame(
        [
            (0, f"prefix tokens {base} suffix tokens"),   # contains the eval 13-gram
            (1, base),                                    # IS the eval 13-gram
            (2, " ".join(f"w{j}" for j in range(12))),    # only a 12-gram prefix
            (3, "completely unrelated text with many distinct words here okay"),
            (4, "short doc"),                             # < 13 tokens: never contaminated
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"eval question about {base} end"), (101, "other eval text")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in D.decontaminate(train, eval_df, k=13).select("doc_id").collect()
    )
    assert kept == [2, 3, 4]
    # k=1 degenerates to any-shared-token
    kept1 = sorted(
        r.doc_id
        for r in D.decontaminate(
            spark.createDataFrame([(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"),
            spark.createDataFrame([(9, "beta zeta")], "doc_id long, text string"),
            k=1,
        ).select("doc_id").collect()
    )
    assert kept1 == [1]


def test_ivf_topk_recall_on_clustered_corpus(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(77))
    # 8 well-separated clusters of 40 vectors each at dim=32
    centers = rng.standard_normal((8, 32)) * 4
    rows = []
    for i in range(320):
        v = centers[i % 8] + rng.standard_normal(32) * 0.3
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter("vec_id < 5").selectExpr("vec_id as qid", "embedding as qe")

    exact = {
        (r.qid, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, qs, k=5).collect()
    }
    approx = {
        (r.qid, r.neighbor_id)
        for r in SIM.ivf_topk(emb, qs, k=5, n_centroids=16, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall} below 0.9"
    # plan shape: cell equi-join, never a cartesian/BNLJ
    plan = SIM.ivf_topk(emb, qs, k=5, n_centroids=16, n_probe=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_centroids_deterministic(spark):
    import numpy as np

    rows = [(i, [float((i * 13 + j * 7) % 11) for j in range(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = SIM.ivf_train_centroids(emb, n_centroids=4, sample_n=100)
    c2 = SIM.ivf_train_centroids(emb, n_centroids=4, sample_n=100)
    assert np.allclose(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_neardup_components_chain_transitivity(spark):
    # a-b and b-c paired but never (a,c): all three must share one
    # component, and the representative must be the global min id
    from illumio_spark.operators.dedup import neardup_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "id_a long, id_b long"
    )
    comp = {r.doc_id: r.component for r in neardup_components(nodes, pairs).collect()}
    assert comp[0] == comp[3] == comp[5] == 0  # chain collapses to min id
    assert comp[1] == comp[2] == 1
    assert comp[4] == 4  # singleton keeps its own id


def test_neardup_components_no_pairs_converges_immediately(spark):
    # a pair-free corpus must converge in one round with identity labels
    from illumio_spark.operators.dedup import neardup_components

    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    comp = {r.doc_id: r.component for r in neardup_components(nodes, pairs).collect()}
    assert comp == {i: i for i in range(4)}


def test_neardup_components_path_graph_diameter_1000(spark):
    """VERDICT r5 task 7: a 1,000-node path graph (diameter 999) is the
    adversarial case for plain min-label propagation (would need ~999
    rounds); pointer jumping doubles the covered distance per round, so
    the default max_iters=20 (2^20 diameter budget) must converge it and
    label every node with the path's minimum id."""
    from illumio_spark.operators.dedup import neardup_components

    n = 1000
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = neardup_components(nodes, pairs).collect()
    assert len(comp) == n
    assert all(r.component == 0 for r in comp)


def test_neardup_components_raises_on_nonconvergence(spark):
    """r5 ADVICE: exhausting max_iters without a fixpoint must raise, not
    silently return split components."""
    import pytest

    from illumio_spark.operators.dedup import neardup_components

    n = 64
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(nodes, pairs, max_iters=2)


def test_incremental_neardup_equals_combined_run(neardup_corpus):
    """Task-1 equivalence contract (VERDICT r6): splitting the corpus
    into two runs fed through the signature frontier keeps EXACTLY the
    docs a single combined run keeps (ids grow monotonically across
    runs, so 'seen wins' == 'min id wins'). The split boundary lands so
    near-dup pairs straddle it (originals < 120, dups at 1000000+)."""
    batch1 = neardup_corpus.filter(F.col("doc_id") < 120)
    batch2 = neardup_corpus.filter(F.col("doc_id") >= 120)
    kept1, bands1 = D.incremental_neardup(batch1, None)
    kept2, bands2 = D.incremental_neardup(batch2, bands1)
    combined = D.neardup_keepers(neardup_corpus, hash_fn="xxhash64")
    incr_ids = {r.doc_id for r in kept1.collect()} | {
        r.doc_id for r in kept2.collect()
    }
    comb_ids = {r.doc_id for r in combined.collect()}
    assert incr_ids == comb_ids
    # every cross-boundary dup dropped in run 2, none of them kept
    assert not any(i >= 1000000 and (i - 1000000) < 40 for i in incr_ids)
    # frontier state: n_bands rows per processed doc, kept or not
    assert bands1.count() == 120 * D.N_BANDS
    assert bands2.count() == batch2.count() * D.N_BANDS


def test_incremental_neardup_resubmission_stays_dropped(spark):
    """Re-running a batch against its own frontier drops EVERYTHING
    (every doc is an exact signature match of its seen self), and
    re-submitting content that was DROPPED in run 1 (a near-dup loser)
    still drops in run 2 — the frontier records processed docs, not
    survivors."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base + " mu"), (3, "totally different text about unrelated things entirely")]
    b1 = spark.createDataFrame(rows, "doc_id long, text string")
    kept1, bands1 = D.incremental_neardup(b1, None)
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 3]  # 2 is near-dup loser
    # rerun same content under new ids: everything already seen
    b2 = spark.createDataFrame(
        [(11, base), (12, base + " mu")], "doc_id long, text string"
    )
    kept2, _ = D.incremental_neardup(b2, bands1)
    assert kept2.count() == 0
    # genuinely new content under the same frontier survives
    b3 = spark.createDataFrame(
        [(21, "fresh words never observed before in any prior run batch")],
        "doc_id long, text string",
    )
    kept3, _ = D.incremental_neardup(b3, bands1)
    assert kept3.count() == 1


def test_incremental_neardup_transitive_chain_through_new(spark):
    """a(seen) ~ b(new) ~ c(new) where c never pairs with a directly:
    b drops via the seen component, and c — reachable from seen only
    THROUGH b — must drop too (restricted >=1-new edges preserve
    reachability-to-seen)."""
    t = "one two three four five six seven eight nine ten eleven twelve"
    seen = spark.createDataFrame([(1, t)], "doc_id long, text string")
    _, bands = D.incremental_neardup(seen, None)
    chain = spark.createDataFrame(
        [(10, t + " x"), (11, t + " x y")], "doc_id long, text string"
    )
    kept, _ = D.incremental_neardup(chain, bands)
    assert kept.count() == 0


def test_incremental_embedding_neardup_equals_combined_run(spark):
    """The frontier trio's third member: cross-run embedding near-dup
    must keep exactly what one combined run keeps (run-2 ids above
    run-1 ids). Clustered corpus so near-dup groups straddle the run
    boundary; bucket assignment is seed-deterministic, so cross-run
    candidates equal combined-run candidates exactly."""
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.standard_normal((30, 16))
    rows = []
    for i in range(30):
        rows.append((i, base[i].tolist()))
    # near-dups of vectors 0..9 land in the SECOND batch (ids 100+)
    for i in range(10):
        rows.append((100 + i, (base[i] + 0.01 * rng.standard_normal(16)).tolist()))
    # plus a second-batch-only near-dup pair (120, 121)
    v = rng.standard_normal(16)
    rows.append((120, v.tolist()))
    rows.append((121, (v + 0.01 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b1 = df.filter(F.col("vec_id") < 100)
    b2 = df.filter(F.col("vec_id") >= 100)

    kw = dict(threshold=0.95, n_planes=4, dim=16, n_tables=3)
    kept1, bk1, vc1 = SIM.incremental_embedding_neardup(b1, None, None, **kw)
    kept2, bk2, vc2 = SIM.incremental_embedding_neardup(b2, bk1, vc1, **kw)
    incr = {r.vec_id for r in kept1.collect()} | {r.vec_id for r in kept2.collect()}

    # combined single run: verified pairs -> CC -> min-id keepers
    from illumio_spark.operators.dedup import neardup_components

    pairs = SIM.lsh_neardup_pairs(
        df, vec_col="embedding", threshold=0.95, n_planes=4, dim=16, n_tables=3
    )
    comp = neardup_components(df.select("vec_id"), pairs, "vec_id")
    comb = {r.vec_id for r in comp.filter("vec_id = component").collect()}
    assert incr == comb
    # the straddling near-dups dropped; the batch-2-only pair kept one
    assert not any(100 <= i < 110 for i in incr)
    assert (120 in incr) and (121 not in incr)
    # frontier state: n_tables bucket rows and one vec row per processed doc
    assert bk2.count() == 12 * 3 and vc2.count() == 12


def _bridge_vectors():
    """Deterministic (a, b, c) in R16 with cos(a,b) = 0.7 < 0.9 but
    cos(c,a) = cos(c,b) = sqrt(1.7/2) ≈ 0.922 >= 0.9 — c is the
    normalized midpoint, the embedding-space bridge."""
    import math

    a = [1.0] + [0.0] * 15
    b = [0.7, math.sqrt(1 - 0.49)] + [0.0] * 14
    n = math.sqrt(sum((x + y) ** 2 for x, y in zip(a, b)))
    c = [(x + y) / n for x, y in zip(a, b)]
    return a, b, c


def test_incremental_embedding_bridge_divergence_and_compaction(spark):
    """The embedding twin of the minhash bridge pin: batch 1 emits
    vectors A and B (cosine 0.7, correctly both kept at threshold 0.9);
    batch 2's midpoint C is within threshold of both — a combined run
    keeps only A, the incremental run has already emitted B (superset
    contract). compact_embedding_frontier then resolves it purely from
    persisted state: canonical {A}, retraction (B → A)."""
    a, b, c = _bridge_vectors()
    kw = dict(threshold=0.9, n_planes=4, dim=16, n_tables=3)
    df = spark.createDataFrame(
        [(1, a), (2, b), (10, c)], "vec_id long, embedding array<double>"
    )
    # precondition: one combined run over all three keeps only A —
    # i.e. both bridge edges bucket-collide AND cosine-verify
    kept_all, _, _ = SIM.incremental_embedding_neardup(df, None, None, **kw)
    assert {r.vec_id for r in kept_all.collect()} == {1}
    # and A alone vs B alone are NOT near-dups
    both = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<double>"
    )
    kept_ab, bk1, vc1 = SIM.incremental_embedding_neardup(both, None, None, **kw)
    assert {r.vec_id for r in kept_ab.collect()} == {1, 2}
    # two-run split: C arrives after both were emitted
    b2 = spark.createDataFrame([(10, c)], "vec_id long, embedding array<double>")
    kept2, bk2, vc2 = SIM.incremental_embedding_neardup(b2, bk1, vc1, **kw)
    assert kept2.count() == 0  # C touches seen; still drops
    incr = {1, 2}  # emitted across both runs — superset of combined {1}
    # compaction from persisted state alone
    buckets = bk1.unionByName(bk2)
    vecs = vc1.unionByName(vc2)
    emitted = spark.createDataFrame([(1,), (2,)], "vec_id long")
    canonical, rets = SIM.compact_embedding_frontier(
        buckets, vecs, emitted, threshold=0.9
    )
    assert {r.vec_id for r in canonical.collect()} == {1}
    rr = rets.collect()
    assert [(r.vec_id, r.component) for r in rr] == [(2, 1)]
    assert incr - {r.vec_id for r in rr} == {1}


def test_compact_embedding_frontier_no_bridge_no_retractions(spark):
    """Compaction over a clustered corpus's full frontier equals the
    combined-run keeper set and retracts nothing when emitted == that
    set; duplicated state rows (idempotent re-appends) change nothing."""
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.standard_normal((30, 16))
    rows = [(i, base[i].tolist()) for i in range(30)]
    for i in range(10):
        rows.append((100 + i, (base[i] + 0.01 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, n_planes=4, dim=16, n_tables=3)
    kept, bk, vc = SIM.incremental_embedding_neardup(df, None, None, **kw)
    want = {r.vec_id for r in kept.collect()}
    got = {
        r.vec_id
        for r in SIM.compact_embedding_frontier(bk, vc, threshold=0.95).collect()
    }
    assert got == want
    doubled_b, doubled_v = bk.unionByName(bk), vc.unionByName(vc)
    _, rets = SIM.compact_embedding_frontier(
        doubled_b, doubled_v, kept.select("vec_id"), threshold=0.95
    )
    assert rets.count() == 0


def test_bucket_verified_pairs_equals_expression_verify(spark):
    """The per-bucket blocked-matmul verifier must emit exactly the
    pairs the join-then-cosine-expression form does — including with a
    block size smaller than the bucket (the hot-bucket memory path) and
    a zero vector (NaN-normalized, never passes)."""
    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    for c in range(6):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        for j in range(8):
            v = base + 0.1 / 4.0 * rng.standard_normal(16)
            rows.append((c * 10 + j, (v / np.linalg.norm(v)).tolist()))
    rows.append((999, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ev = df.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
    bucketed = SIM._bucketed_long(ev, "vec_id", "__v", 4, 16, 3).select(
        "vec_id", "tbl", "bucket", "__v"
    )
    got = {
        (r.id_a, r.id_b)
        for r in SIM.bucket_verified_pairs(
            bucketed, threshold=0.9, block=5
        ).collect()
    }
    a = bucketed.select(
        F.col("vec_id").alias("id_a"), "tbl", "bucket",
        F.col("__v").alias("va"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"), "tbl", "bucket",
        F.col("__v").alias("vb"),
    )
    want = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, ["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(SIM.cosine(F.col("va"), F.col("vb")) >= 0.9)
            .select("id_a", "id_b")
            .distinct()
        ).collect()
    }
    assert got == want and len(got) > 0
    assert not any(999 in p for p in got)
    # hot-bucket fallback: forcing every bucket (hot_bucket_rows=1) or a
    # mixed split (=8) through the distributed join path must not change
    # the pair set
    for hot in (1, 8):
        got_hot = {
            (r.id_a, r.id_b)
            for r in SIM.bucket_verified_pairs(
                bucketed, threshold=0.9, block=5, hot_bucket_rows=hot
            ).collect()
        }
        assert got_hot == want, f"hot_bucket_rows={hot}"
    # non-integral id columns are rejected with a clear error
    import pytest as _pytest

    with _pytest.raises(TypeError, match="integral id column"):
        SIM.bucket_verified_pairs(
            bucketed.withColumn("vec_id", F.col("vec_id").cast("string")),
            threshold=0.9,
        )


def test_pandas_score_zero_vector_ranks_like_expr(spark):
    """A zero-norm candidate must rank identically under both scorers:
    the pandas path maps non-finite cosines to NULL (NaN would sort
    FIRST under desc() and crown the zero vector every query's top
    neighbor; NULL sorts last like try_divide's output)."""
    rows = [(i, [float(i + 1)] * 8) for i in range(6)] + [(99, [0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    kw = dict(k=10, n_planes=2, dim=8, n_tables=2, broadcast_vectors=True)
    want = [
        (r.qid, r.neighbor_id, r.rank)
        for r in SIM.lsh_topk(emb, qs, **kw).orderBy("qid", "rank").collect()
    ]
    got = [
        (r.qid, r.neighbor_id, r.rank)
        for r in SIM.lsh_topk(emb, qs, score="pandas", **kw)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == want and len(got) > 0
    # the zero vector must never outrank a genuine neighbor
    ranks = {nid: rk for _, nid, rk in got}
    assert 99 not in ranks or ranks[99] == max(ranks.values())


def test_lsh_neardup_pairs_matmul_mode_equals_expr(spark):
    """The engine-default verify='matmul' mode must produce the exact
    pair set of the oracle-parity expression mode on the real
    embeddings table (the td_embedding_neardup corpus)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    near = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + 0.05
        ).alias("v"),
    )
    corpus = base.unionByName(near)
    kw = dict(threshold=0.9, n_planes=8, dim=64, n_tables=9)
    expr_pairs = {
        (r.id_a, r.id_b)
        for r in SIM.lsh_neardup_pairs(corpus, **kw).collect()
    }
    mm_pairs = {
        (r.id_a, r.id_b)
        for r in SIM.lsh_neardup_pairs(corpus, verify="matmul", **kw).collect()
    }
    assert mm_pairs == expr_pairs and len(expr_pairs) > 0


def test_ivf_topk_pandas_score_equals_expr(spark):
    """ivf_topk(score='pandas') must rank identically to the
    expression-score oracle mode — exact on the integer-valued driver
    corpus where every dot/norm is an exact double in both paths."""
    from illumio_spark.queries.catalog_td import (
        _ivf_centroids_int,
        _ivf_int_corpus,
        td_ann_ivf_topk,
    )

    want = [
        (r.qid, r.neighbor_id, r.rank)
        for r in td_ann_ivf_topk(spark, "/root/testdata/sf0.001").collect()
    ]
    vecs, qs = _ivf_int_corpus(spark, "/root/testdata/sf0.001")
    got = [
        (r.qid, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk(
            vecs, qs, k=10, n_probe=3, centroids=_ivf_centroids_int(),
            score="pandas",
        ).orderBy("qid", "rank").collect()
    ]
    assert got == want and len(got) > 0


def test_lsh_topk_pandas_score_equals_expr(spark):
    """lsh_topk(score='pandas') ranks identically to the expression
    score on the real embeddings table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    kw = dict(k=10, n_planes=4, broadcast_vectors=True)
    want = [
        (r.qid, r.neighbor_id, r.rank)
        for r in SIM.lsh_topk(emb, qs, **kw).orderBy("qid", "rank").collect()
    ]
    got = [
        (r.qid, r.neighbor_id, r.rank)
        for r in SIM.lsh_topk(emb, qs, score="pandas", **kw)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_incremental_neardup_random_split_sweep(spark):
    """Property-style sweep: random corpora with planted exact/near/chain
    duplicates, split at random boundaries into two runs — the frontier
    path must reproduce the combined single run's keeper set at every
    split. Deterministic seeds; ids monotonic across the split so
    'seen wins' == 'min id wins'."""
    import random

    for seed, cut in [(3, 40), (5, 80), (9, 10)]:
        rng = random.Random(seed)
        words = [f"w{i}" for i in range(150)]
        rows = []
        for i in range(100):
            n = rng.randint(25, 50)
            rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
        # exact dups, near dups, and a 3-link chain across the id space
        for i in range(0, 20, 2):
            rows.append((200 + i, rows[i][1]))                # exact dup
            rows.append((300 + i, rows[i][1] + " xx"))        # near dup
            rows.append((400 + i, rows[i][1] + " xx yy"))     # chain link
        df = spark.createDataFrame(rows, "doc_id long, text string")
        b1 = df.filter(F.col("doc_id") < cut)
        b2 = df.filter(F.col("doc_id") >= cut)
        kept1, bands1 = D.incremental_neardup(b1, None)
        kept2, _ = D.incremental_neardup(b2, bands1)
        incr = {r.doc_id for r in kept1.collect()} | {
            r.doc_id for r in kept2.collect()
        }
        comb = {r.doc_id for r in D.neardup_keepers(df, hash_fn="xxhash64").collect()}
        assert incr == comb, f"seed={seed} cut={cut}"
    # Equality holds here because every planted dup collides with its
    # original DIRECTLY; the one divergence case (a later-batch bridge
    # doc linking two earlier keepers) is pinned separately by
    # test_incremental_neardup_bridge_divergence.


def _bridge_triple():
    """Deterministic (a, b, c) where c = a+' '+b band-collides with both
    a and b but a and b never collide — verified in-test. 8 minhashes /
    4 bands over 3-word shingles; found by seed search, stable because
    xxhash64 is deterministic."""
    import random

    rng = random.Random(0)
    w = [f"w{i}" for i in range(300)]
    a = " ".join(rng.choice(w) for _ in range(30))
    b = " ".join(rng.choice(w) for _ in range(30))
    return a, b, a + " " + b


def test_incremental_neardup_bridge_divergence(spark):
    """The ONE case where incremental != combined, pinned: batch 1 holds
    A and B (not near-dups of each other — both correctly kept); batch 2
    holds bridge doc C, similar to both. The combined run merges
    {A, B, C} and keeps only A; the incremental run has already emitted
    B and cannot retract it. Contract: incremental keeps a strict
    SUPERSET (never drops a combined keeper), extras are exactly these
    retroactive bridge merges."""
    a, b, c = _bridge_triple()
    df = spark.createDataFrame(
        [(1, a), (2, b), (10, c)], "doc_id long, text string"
    )
    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in D.minhash_lsh_pairs(df, hash_fn="xxhash64").collect()
    }
    assert pairs == {(1, 10), (2, 10)}  # precondition: C bridges, A !~ B
    b1 = df.filter(F.col("doc_id") < 10)
    b2 = df.filter(F.col("doc_id") == 10)
    kept1, bands1 = D.incremental_neardup(b1, None)
    kept2, _ = D.incremental_neardup(b2, bands1)
    incr = {r.doc_id for r in kept1.collect()} | {
        r.doc_id for r in kept2.collect()
    }
    comb = {r.doc_id for r in D.neardup_keepers(df, hash_fn="xxhash64").collect()}
    assert comb == {1}
    assert incr == {1, 2}  # superset; 2 is the un-retractable extra
    assert comb <= incr


def test_incremental_neardup_reports_seen_merges(spark):
    """report_seen_merges=True surfaces the bridge event as a retraction
    signal: the batch that introduces C reports seen docs {A, B} newly
    proved connected (one component, two rows); a batch with no bridge
    reports nothing."""
    a, b, c = _bridge_triple()
    b1 = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    kept1, bands1, merges1 = D.incremental_neardup(
        b1, None, report_seen_merges=True
    )
    assert merges1.count() == 0  # first run: no seen docs at all
    b2 = spark.createDataFrame([(10, c)], "doc_id long, text string")
    kept2, _, merges2 = D.incremental_neardup(
        b2, bands1, report_seen_merges=True
    )
    rows = merges2.collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert {r.component for r in rows} == {1}  # one merged group
    assert kept2.count() == 0  # the bridge itself still drops
    # a non-bridging batch reports no merges
    b3 = spark.createDataFrame(
        [(20, "totally fresh unrelated words never seen before anywhere")],
        "doc_id long, text string",
    )
    _, _, merges3 = D.incremental_neardup(b3, bands1, report_seen_merges=True)
    assert merges3.count() == 0


def test_compact_frontier_retracts_bridge_merge(spark):
    """Compaction closes the incremental-vs-combined gap: after the
    bridge batches emit {A, B}, full CC over the persisted band table
    returns canonical {A} and retraction (B → A) — removing retractions
    from the emitted set reproduces the combined run exactly."""
    a, b, c = _bridge_triple()
    b1 = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    b2 = spark.createDataFrame([(10, c)], "doc_id long, text string")
    kept1, bands1 = D.incremental_neardup(b1, None)
    kept2, bands2 = D.incremental_neardup(b2, bands1)
    frontier = bands1.unionByName(bands2)
    emitted = kept1.select("doc_id").unionByName(kept2.select("doc_id"))
    canonical, retractions = D.compact_neardup_frontier(frontier, emitted)
    assert {r.doc_id for r in canonical.collect()} == {1}
    rets = retractions.collect()
    assert [(r.doc_id, r.component) for r in rets] == [(2, 1)]
    emitted_ids = {r.doc_id for r in emitted.collect()}
    df = b1.unionByName(b2)
    comb = {r.doc_id for r in D.neardup_keepers(df, hash_fn="xxhash64").collect()}
    assert emitted_ids - {r.doc_id for r in rets} == comb


def test_compact_frontier_equals_combined_keepers(spark):
    """On a real corpus: canonical ids from the band table alone equal
    neardup_keepers over the raw text (compaction never re-reads text),
    and duplicated band rows (idempotent frontier re-appends) change
    nothing."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    bands = D.band_signatures(docs)
    want = {r.doc_id for r in D.neardup_keepers(docs, hash_fn="xxhash64").collect()}
    got = {
        r.doc_id for r in D.compact_neardup_frontier(bands).collect()
    }
    assert got == want
    doubled = bands.unionByName(bands)  # replayed append
    got2 = {
        r.doc_id for r in D.compact_neardup_frontier(doubled).collect()
    }
    assert got2 == want
    # no-bridge frontier: zero retractions against its own keeper set
    emitted = D.neardup_keepers(docs, hash_fn="xxhash64").select("doc_id")
    _, rets = D.compact_neardup_frontier(bands, emitted)
    assert rets.count() == 0
