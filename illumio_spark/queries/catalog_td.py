"""Training-data-pipeline queries: dedup, similarity, text analysis,
multimodal plumbing — each with a DuckDB oracle where SQL can express it.

Cross-engine hash discipline: anything the oracle must reproduce uses md5
(identical hex in both engines); engine-internal signatures (simhash,
rolling fingerprint) are rows-only checks validated by pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from illumio_spark.operators import dedup as D
from illumio_spark.operators import similarity as SIM
from illumio_spark.functions import text as TX
from illumio_spark.queries.catalog import QUERIES, load, q

# ---------------------------------------------------------------------------
# corpus constructors: deterministic duplicates / near-duplicates injected on
# top of the testdata `documents` table so dedup queries have signal
# ---------------------------------------------------------------------------

_DUP_SQL_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50
"""

_NEARDUP_SQL_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text || ' trailing near dup suffix' AS text
    FROM documents WHERE doc_id < 30
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionByName(dups)


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing near dup suffix")).alias("text"),
    )
    return d.unionByName(near)


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@q(
    "td_exact_dedup",
    f"""
    SELECT fp, keeper, n_copies FROM (
        SELECT md5(text) AS fp, MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM ({_DUP_SQL_CORPUS}) GROUP BY 1
    ) WHERE n_copies > 1
    """,
)
def td_exact_dedup(spark, sf_dir):
    corpus = _dup_corpus(spark, sf_dir)
    return D.exact_dedup_keepers(corpus).filter(F.col("n_copies") > 1)


@q(
    "td_minhash_signature",
    """
    WITH sh AS (
        SELECT doc_id, UNNEST(list_distinct(list_transform(
            range(1, GREATEST(len(string_split_regex(TRIM(text), '\\s+')) - 1, 1)),
            i -> string_split_regex(TRIM(text), '\\s+')[i] || ' ' ||
                 string_split_regex(TRIM(text), '\\s+')[i+1] || ' ' ||
                 string_split_regex(TRIM(text), '\\s+')[i+2]
        ))) AS s
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, MIN(md5('s0-' || s)) AS mh0, MIN(md5('s1-' || s)) AS mh1,
           MIN(md5('s2-' || s)) AS mh2, MIN(md5('s3-' || s)) AS mh3
    FROM sh GROUP BY doc_id
    """,
)
def td_minhash_signature(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = D.word_shingles(F.col("text"), 3)
    return d.select("doc_id", *D.minhash_signature(sh, n_hashes=4))


@q("td_minhash_lsh_pairs", None)  # band-join plan; ground truth via pytest
def td_minhash_lsh_pairs(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir)
    sh = D.word_shingles(F.col("text"), 3)
    sigs = corpus.select("doc_id", *D.minhash_signature(sh, n_hashes=D.N_MINHASH))
    sigs = sigs.select("doc_id", *[c for c in sigs.columns if c != "doc_id"], *D.lsh_bands())
    return D.lsh_candidate_pairs(sigs).orderBy("id_a", "id_b")


@q(
    "td_ngram_jaccard",
    f"""
    WITH corpus AS ({_NEARDUP_SQL_CORPUS}),
    sh AS (
        SELECT doc_id, UNNEST(list_distinct(list_transform(
            range(1, GREATEST(len(string_split_regex(TRIM(text), '\\s+')) - 1, 1)),
            i -> string_split_regex(TRIM(text), '\\s+')[i] || ' ' ||
                 string_split_regex(TRIM(text), '\\s+')[i+1] || ' ' ||
                 string_split_regex(TRIM(text), '\\s+')[i+2]
        ))) AS s
        FROM corpus
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    """,
)
def td_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_neardup_corpus(spark, sf_dir), threshold=0.5)


@q("td_simhash_neardup", None)  # engine-internal 64-bit hashing; pytest-validated
def td_simhash_neardup(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir).withColumn("sig", TX.simhash(F.col("text")))
    a, b = corpus.alias("a"), corpus.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", TX.hamming64(F.col("a.sig"), F.col("b.sig")))
        .filter(F.col("hamming") <= 3)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            "hamming",
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@q(
    "td_ann_cosine_topk",
    """
    WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5)
    SELECT qid, neighbor_id, rank FROM (
        SELECT qs.qid, e.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY qs.qid
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qs.qe) DESC, e.vec_id
               ) AS INTEGER) AS rank
        FROM embeddings e, qs WHERE e.vec_id <> qs.qid
    ) WHERE rank <= 10
    """,
)
def td_ann_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return SIM.brute_force_topk(emb, qs, k=10)


@q("td_ann_lsh_topk", None)  # bucketed approximate variant; recall vs pytest
def td_ann_lsh_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return SIM.lsh_topk(emb, qs, k=10, n_planes=4).orderBy("qid", "rank")


@q(
    "td_embedding_norms",
    """
    SELECT vec_id, ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2
    FROM embeddings WHERE vec_id < 200
    """,
)
def td_embedding_norms(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select(
        "vec_id",
        F.round(SIM.l2_norm(F.col("embedding").cast("array<double>")), 4).alias("l2"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@q(
    "td_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(TRIM(text), '\\s+')) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INTEGER) AS n_bpe_ish
    FROM documents
    """,
)
def td_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


@q(
    "td_quality_score",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars,
           CAST(len(string_split_regex(TRIM(text), '\\s+')) AS INTEGER) AS n_words,
           ROUND(CAST(LENGTH(text) AS DOUBLE) / len(string_split_regex(TRIM(text), '\\s+')), 4) AS chars_per_word,
           ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6) AS punct_ratio
    FROM documents
    """,
)
def td_quality_score(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    cols = TX.quality_columns(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@q(
    "td_stopword_signal",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\\s+'),
                w -> list_contains(['the','a','of','and','to','in','is'], w))) AS INTEGER) AS n_stop
    FROM documents
    """,
)
def td_stopword_signal(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.stopword_count(F.col("text")).alias("n_stop"))


@q("td_lang_guess", None)  # pandas-UDF marker-word language ID; pytest-validated
def td_lang_guess(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.lang_guess(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )


@q("td_rolling_fingerprint", None)  # engine-internal 64-bit hash; pytest-validated
def td_rolling_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", TX.rolling_fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal plumbing (binary columns + typed metadata; decode is a
# deterministic fake — the image/audio libs aren't in this container)
# ---------------------------------------------------------------------------


@q(
    "td_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def td_multimodal_meta(spark, sf_dir):
    # binary column → mapInPandas "decode" returning typed metadata; the
    # Spark-side plumbing (schema, batch shape) is real, the decode is a
    # deterministic fake (see illumio_spark/functions/multimodal.py)
    from illumio_spark.functions.multimodal import decode_meta

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_meta(d)
