"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; LSH-bucketed
(random hyperplane signs) as the scale path — bucket join instead of the
O(n·q) cross join. Dot products run JVM-side via zip_with/aggregate in
double precision (bit-identical to the DuckDB oracle's sequential sum).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

LSH_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(vec) -> "F.Column":
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    # try_divide: a zero-norm vector yields NULL similarity instead of a
    # DIVIDE_BY_ZERO abort under Spark 4's default ANSI mode
    return F.try_divide(_dot(a, b), l2_norm(a) * l2_norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    The query side is broadcast (small by construction); the corpus is
    scanned once — at 100 TB this is one map-side pass per query batch,
    then a top-k per query (window over a small shuffled slice)."""
    e = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    qn = queries.select(F.col(qid_col), F.col(qvec_col).cast("array<double>").alias("qv"))
    scored = (
        e.join(F.broadcast(qn), F.col(id_col) != F.col(qid_col))
        .withColumn("cos", cosine(F.col("v"), F.col("qv")))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col).alias("neighbor_id"), F.col("rank"))
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_column(vec, n_planes: int, dim: int, seed: int) -> "F.Column":
    """Random-hyperplane LSH: sign pattern of <v, p_i> → integer bucket.

    Deterministic planes (seeded) are embedded as literal arrays — at scale
    these would ship via broadcast; sign computation is pure JVM fold."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def _bucketed_long(df: DataFrame, id_alias: str, vec_alias: str,
                   n_planes: int, dim: int, n_tables: int) -> DataFrame:
    """(id, vec) → exploded (id, vec, table_idx, bucket) over L hash tables."""
    v = F.col(vec_alias)
    buckets = F.array(
        *[lsh_bucket_column(v, n_planes, dim, LSH_SEED + t) for t in range(n_tables)]
    )
    return df.select(
        id_alias, vec_alias, F.posexplode(buckets).alias("tbl", "bucket")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 3,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    OR-construction over L independent hash tables fixes the single-probe
    boundary miss (a vector near a hyperplane flips sign under tiny
    perturbation); candidates = equi-join on (table, bucket) — never a
    cross join. Recall knobs: fewer planes → bigger buckets; more tables →
    more probes. This is the 100 TB path: bucket assignment is a map-only
    pass, the join shuffles only on compact bucket keys."""
    e = _bucketed_long(
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")),
        id_col, "v", n_planes, dim, n_tables,
    )
    qn = _bucketed_long(
        queries.select(F.col(qid_col), F.col(qvec_col).cast("array<double>").alias("qv")),
        qid_col, "qv", n_planes, dim, n_tables,
    ).withColumnRenamed("tbl", "q_tbl").withColumnRenamed("bucket", "q_bucket")
    candidates = (
        e.join(
            F.broadcast(qn),
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col(id_col) != F.col(qid_col)),
        )
        .select(qid_col, "qv", id_col, "v")
        .dropDuplicates([qid_col, id_col])
    )
    scored = candidates.withColumn("cos", cosine(F.col("v"), F.col("qv")))
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col).alias("neighbor_id"), F.col("rank"))
    )
