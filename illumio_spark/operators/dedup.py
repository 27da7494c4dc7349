"""Deduplication operators for training-data pipelines.

All hashing that must agree with the DuckDB oracle uses md5 (identical hex
in both engines); engine-internal fast paths (xxhash64) are used where no
cross-engine agreement is needed.

Scale notes:
  - exact dedup = hash-groupBy on the fingerprint — one shuffle, AQE
    handles skew on pathological identical-document corpora.
  - minhash = per-row array expressions (no shuffle); LSH banding turns
    near-dup search into an equi-join on band keys, avoiding the O(n²)
    cross join entirely — the 100 TB path.
  - ngram-jaccard ground truth explodes shingles (shuffle on shingle) —
    quadratic in the worst case; use it to validate minhash at small SF,
    never at full scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH / N_BANDS


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text column.

    Texts with fewer than k tokens yield an empty array (matches the
    DuckDB oracle's end-exclusive range()); the n >= k guard is required
    because sequence(1, 0) is the DESCENDING [1, 0] and element_at(toks, 0)
    throws under Spark 4's default ANSI mode."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(k)]
    )
    return F.array_distinct(F.transform(idx, shingle))


def fingerprint_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup fingerprint (md5) — the hash-groupBy dedup primitive."""
    return df.withColumn("fp", F.md5(F.col(text_col)))


def minhash_signature(shingles: Column, n_hashes: int = N_MINHASH) -> list[Column]:
    """MinHash via lexicographic-min of salted md5 over the shingle set.

    min(md5(salt_i || s)) is a uniform permutation-min approximation that
    both Spark and DuckDB compute identically (cross-engine-checkable).

    NB: the per-salt lambda must stay single-parameter — pyspark binds a
    second parameter of a transform() lambda to the array index.

    Scale note: pass a pre-materialized shingles COLUMN (see
    minhash_signatures_df) when n_hashes > 1 — each mh_i embeds its own
    copy of the shingle expression tree, and higher-order functions run
    interpreted (no codegen, no subexpression elimination), so inlined
    shingles get rebuilt n_hashes times per row (measured 8× ≈ 45 s vs
    6 s on 5k docs)."""

    def salted(salt: str):
        return lambda s: F.md5(F.concat(F.lit(salt), s))

    return [
        F.array_min(F.transform(shingles, salted(f"s{i}-"))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def minhash_signatures_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 3, n_hashes: int = N_MINHASH,
) -> DataFrame:
    """(id, mh0..mh{n-1}) with the shingle array built ONCE per row.

    The shingles land in their own projection; because the column is
    referenced by every mh_i (multi-reference, non-cheap), Catalyst's
    CollapseProject keeps the projections separate instead of re-inlining
    the shingle tree into each hash — the 100 TB-path guarantee that
    signature cost is O(shingles + n_hashes·shingles), not
    O(n_hashes·shingle_build)."""
    with_sh = df.withColumn("__sh", word_shingles(F.col(text_col), k))
    return with_sh.select(id_col, *minhash_signature(F.col("__sh"), n_hashes))


def lsh_bands(n_hashes: int = N_MINHASH, n_bands: int = N_BANDS) -> list[Column]:
    """Band keys = md5 of concatenated rows of the signature (call after
    minhash_signature columns mh0..mh{n-1} exist)."""
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(F.md5(F.concat_ws("|", *cols)).alias(f"band{b}"))
    return bands


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidate pairs: equi-join on any shared band key.

    Explodes to (id, band_idx, band_key), self-joins on the band key —
    the shuffle is on band keys (small), never an O(n²) cross join.
    """
    bands = [c for c in sigs.columns if c.startswith("band")]
    stack_expr = ", ".join(f"'{b}', {b}" for b in bands)
    long = sigs.selectExpr(id_col, f"stack({len(bands)}, {stack_expr}) as (band_idx, band_key)")
    # materialize via an exchange: the self-join's two sides then share ONE
    # ReusedExchange instead of each recomputing the full signature tree
    long = long.repartition("band_key")
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle explode + equi-join.

    Ground-truth validator for minhash/LSH at small SF (quadratic worst
    case — do not run at full scale)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def exact_dedup_keepers(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep min-id per fingerprint, report duplicate groups."""
    return (
        fingerprint_exact(df, text_col)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
