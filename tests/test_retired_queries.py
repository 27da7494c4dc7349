"""Queries rotated out of the driver's 50-entry window keep full
oracle-equality coverage HERE (VERDICT r3 task 6: retirement must not mean
unverified). Same compare the driver runs: row count + sorted-values
equality vs DuckDB on the identical parquet tables."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "events", "documents", "orders", "lineitem", "customer",
    "supplier", "nation", "region", "embeddings",
]


def _oracle(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def _compare(spark_df, sql: str):
    got = spark_df.toPandas()
    want = _oracle(sql)
    assert len(got) == len(want)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        # astype(object) first: .where(..., None) on a float column keeps
        # NaN (can't hold None), and NaN != NaN fails the comparison
        assert g[c].astype(object).where(g[c].notna(), None).tolist() == \
            w[c].astype(object).where(w[c].notna(), None).tolist(), f"column {c} differs"


def test_a12_deterministic_sample_matches_oracle(spark):
    from illumio_spark.queries.catalog import A12_SQL, a12_deterministic_sample

    _compare(a12_deterministic_sample(spark, SF), A12_SQL)


def test_s15_head_sample_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import S15_SQL, s15_head_sample

    _compare(s15_head_sample(spark, SF), S15_SQL)


def test_s5_limit_batch_matches_oracle(spark):
    from illumio_spark.queries.catalog import S5_SQL, s5_limit_batch

    _compare(s5_limit_batch(spark, SF), S5_SQL)


def test_p11_filename_ts_parse_matches_oracle(spark):
    from illumio_spark.queries.catalog import P11_SQL, p11_filename_ts_parse

    _compare(p11_filename_ts_parse(spark, SF), P11_SQL)


# --- rotated out in r5 for the text-hygiene trio + codec oracle rows -----


def test_q1_pricing_summary_matches_oracle(spark):
    from illumio_spark.queries.catalog import Q1_SQL, q1_pricing_summary

    _compare(q1_pricing_summary(spark, SF), Q1_SQL)


def test_q3_revenue_topn_matches_oracle(spark):
    from illumio_spark.queries.catalog import Q3_SQL, q3_revenue_topn

    _compare(q3_revenue_topn(spark, SF), Q3_SQL)


def test_a9_growth_window_matches_oracle(spark):
    from illumio_spark.queries.catalog import A9_SQL, a9_growth_window

    _compare(a9_growth_window(spark, SF), A9_SQL)


def test_set_intersect_users_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import SET_INTERSECT_SQL, set_intersect_users

    _compare(set_intersect_users(spark, SF), SET_INTERSECT_SQL)


def test_sql_q5_local_supplier_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import _Q5_SQL, sql_q5_local_supplier

    _compare(sql_q5_local_supplier(spark, SF), _Q5_SQL)


def test_a7_count_distinct_matches_oracle(spark):
    from illumio_spark.queries.catalog import A7_SQL, a7_count_distinct

    _compare(a7_count_distinct(spark, SF), A7_SQL)


def test_p6_conditional_class_matches_oracle(spark):
    from illumio_spark.queries.catalog import P6_SQL, p6_conditional_class

    _compare(p6_conditional_class(spark, SF), P6_SQL)


def test_f1_pipe_format_matches_oracle(spark):
    from illumio_spark.queries.catalog import F1_SQL, f1_pipe_format

    _compare(f1_pipe_format(spark, SF), F1_SQL)


def test_td_minhash_signature_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import MINHASH_SIG_SQL, td_minhash_signature

    _compare(td_minhash_signature(spark, SF), MINHASH_SIG_SQL)


def test_a5_counts_by_type_matches_oracle(spark):
    from illumio_spark.queries.catalog import A5_SQL, a5_counts_by_type

    _compare(a5_counts_by_type(spark, SF), A5_SQL)


# --- rotated out in r6 for the verbatim-overlap / URL-domain rows ---------


def test_td_lang_guess_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import LANG_GUESS_SQL, td_lang_guess

    _compare(td_lang_guess(spark, SF), LANG_GUESS_SQL)


def test_td_rolling_fingerprint_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _ROLLING_FP_SQL, td_rolling_fingerprint

    _compare(td_rolling_fingerprint(spark, SF), _ROLLING_FP_SQL)


def test_td_token_count_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import TOKEN_COUNT_SQL, td_token_count

    _compare(td_token_count(spark, SF), TOKEN_COUNT_SQL)


# --- rotated out late-r6 for the corpus-assembly rows ---------------------


def test_td_quality_score_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import QUALITY_SCORE_SQL, td_quality_score

    _compare(td_quality_score(spark, SF), QUALITY_SCORE_SQL)


def test_td_media_sniff_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import MEDIA_SNIFF_SQL, td_media_sniff

    _compare(td_media_sniff(spark, SF), MEDIA_SNIFF_SQL)


# --- rotated out late-r6 for the mixture-materialization rows --------------


def test_td_ngram_jaccard_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import NGRAM_JACCARD_SQL, td_ngram_jaccard

    _compare(td_ngram_jaccard(spark, SF), NGRAM_JACCARD_SQL)


def test_set_except_events_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import SET_EXCEPT_SQL, set_except_events

    _compare(set_except_events(spark, SF), SET_EXCEPT_SQL)


def test_p3_audit_projection_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import P3_SQL, p3_audit_projection

    _compare(p3_audit_projection(spark, SF), P3_SQL)


def test_a8_running_max_merge_matches_oracle(spark):
    from illumio_spark.queries.catalog_ext import A8_SQL, a8_running_max_merge

    _compare(a8_running_max_merge(spark, SF), A8_SQL)


def test_a3_report_matches_oracle(spark):
    from illumio_spark.queries.catalog_pipeline import A3_SQL, a3_report

    _compare(a3_report(spark, SF), A3_SQL)


def test_a10_s16_rate_monitor_matches_oracle(spark):
    from illumio_spark.queries.catalog import A10_S16_SQL, a10_s16_rate_monitor

    _compare(a10_s16_rate_monitor(spark, SF), A10_S16_SQL)


# --- rotated out in r7 for the cross-run near-dup / cut-spans /
# grouped-split driver rows ------------------------------------------------


def test_td_resize_stats_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _RESIZE_STATS_SQL, td_resize_stats

    _compare(td_resize_stats(spark, SF), _RESIZE_STATS_SQL)


def test_td_token_percentiles_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _TOKEN_PCT_SQL, td_token_percentiles

    _compare(td_token_percentiles(spark, SF), _TOKEN_PCT_SQL)


def test_td_frame_sample_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _FRAME_SAMPLE_SQL, td_frame_sample

    _compare(td_frame_sample(spark, SF), _FRAME_SAMPLE_SQL)


# --- rotated out in r7 for the frontier-compaction row ---------------------


def test_td_ann_lsh_topk_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _ann_lsh_sql, td_ann_lsh_topk

    _compare(td_ann_lsh_topk(spark, SF), _ann_lsh_sql())


def test_td_hash_embed_pairs_matches_oracle(spark):
    from illumio_spark.queries.catalog_td import _hash_embed_sql, td_hash_embed_pairs

    _compare(td_hash_embed_pairs(spark, SF), _hash_embed_sql())
