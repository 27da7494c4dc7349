"""Unit tests: text-analysis pandas UDFs + multimodal plumbing stubs."""

import pytest
from pyspark.sql import functions as F

from illumio_spark.functions import text as TX
from illumio_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def langs(spark):
    rows = [
        (0, "the cat and the dog of the house is happy", "en"),
        (1, "der Hund und die Katze ist nicht da und der Mann", "de"),
        (2, "le chat est sur la table et il ne dort pas", "fr"),
        (3, "el perro y la casa que es de los vecinos", "es"),
        (4, "这是一个中文句子 完全没有空格标记", "zh"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_guess(langs):
    out = langs.withColumn("pred", TX.lang_guess(F.col("text"))).collect()
    for r in out:
        assert r.pred == r.lang, f"doc {r.doc_id}: {r.pred} != {r.lang}"


def test_quality_and_tokens(spark):
    df = spark.createDataFrame([(0, "Hello, world! This is six words.")], "id long, text string")
    row = df.select(
        TX.token_count(F.col("text")).alias("n"),
        TX.bpe_ish_token_count(F.col("text")).alias("nb"),
        *[c.alias(k) for k, c in TX.quality_columns(F.col("text")).items()],
    ).collect()[0]
    assert row.n == 6
    assert row.nb == 9  # 6 words + comma + bang + period
    assert row.n_chars == 32
    assert row.punct_ratio == round(3 / 32, 6)


def test_rolling_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "different text")], "id long, text string"
    )
    out = {r.id: r.fp for r in df.select("id", TX.rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[0] == out[1] != out[2]


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(0, b"x" * 100), (1, b"y" * 130), (2, None)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_meta(payloads):
    out = {r.doc_id: r for r in MM.decode_meta(payloads).collect()}
    assert out[0].n_bytes == 100 and out[0].fake_width == 100
    assert out[1].n_bytes == 130
    assert out[2].n_bytes is None


def test_frame_sample(payloads):
    frames = MM.frame_sample(payloads, every_n_bytes=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 2  # 100 bytes / 64 → 2 frames
    assert len(by_doc[1]) == 3  # 130 bytes / 64 → 3 frames
    assert 2 not in by_doc  # null payload yields no frames
    assert len(by_doc[0][0].frame_bytes) == 64
    assert len(by_doc[0][1].frame_bytes) == 36


def test_embed_stub(payloads):
    out = {r.doc_id: r.feature for r in MM.embed_stub(payloads, dim=8).collect()}
    assert len(out[0]) == 8
    assert out[2] is None
    norm = sum(x * x for x in out[0]) ** 0.5
    assert abs(norm - 1.0) < 1e-5
