"""Extended operator coverage: remaining SURVEY.md §2 rows and set ops.

a8 running-max merge, s15 head-sample scan utility, s16 file-rate monitor,
p3 audit projection rename-map, p4 nested array<struct> extraction,
p7b real-MapType fold, set operations (union/intersect/except).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from illumio_spark.queries.catalog import load, q


# a8_running_max_merge was driver-green r2-r6 with unchanged code; rotated
# out late-r6 for the chunk/top-frac/shard rows. Still oracle-checked every
# pytest run via tests/test_retired_queries.py.
A8_SQL = """
    WITH a AS (SELECT event_type, MAX(event_id) AS max_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1),
         b AS (SELECT event_type, MAX(event_id) AS max_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1)
    SELECT COALESCE(a.event_type, b.event_type) AS event_type,
           GREATEST(COALESCE(a.max_id, -1), COALESCE(b.max_id, -1)) AS highest_id,
           COALESCE(a.n, 0) + COALESCE(b.n, 0) AS total
    FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
    """


def a8_running_max_merge(spark, sf_dir):
    # reference: INSERT OR REPLACE history keeping max totals (db_stats.py:40-52)
    # → MERGE-style full-outer combine of two run snapshots
    ev = load(spark, sf_dir, "events")
    mid = F.lit("2024-01-15 00:00:00").cast("timestamp")
    a = (
        ev.filter(F.col("ts") < mid)
        .groupBy("event_type")
        .agg(F.max("event_id").alias("max_id"), F.count(F.lit(1)).alias("n"))
    ).alias("a")
    b = (
        ev.filter(F.col("ts") >= mid)
        .groupBy("event_type")
        .agg(F.max("event_id").alias("max_id"), F.count(F.lit(1)).alias("n"))
    ).alias("b")
    return a.join(b, F.col("a.event_type") == F.col("b.event_type"), "full_outer").select(
        F.coalesce(F.col("a.event_type"), F.col("b.event_type")).alias("event_type"),
        F.greatest(
            F.coalesce(F.col("a.max_id"), F.lit(-1)), F.coalesce(F.col("b.max_id"), F.lit(-1))
        ).alias("highest_id"),
        (F.coalesce(F.col("a.n"), F.lit(0)) + F.coalesce(F.col("b.n"), F.lit(0))).alias("total"),
    )


# S15 was driver-green in r2 AND r3 with unchanged code; rotated out of the
# 50-entry driver window in r4 (VERDICT r3 task 6) to make room for the
# fresh py_strip and hash-embed lineage rows. Still oracle-checked every
# pytest run via tests/test_retired_queries.py against this SQL.
S15_SQL = """
    SELECT source, doc_id, substr(text, 1, 40) AS head,
           NULLIF(TRIM(lang), '') AS lang_clean, UPPER(source) AS source_uc
    FROM (
        SELECT source, doc_id, text, lang,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 3
    """


@q(
    "p2_trim_null_projection",
    """
    SELECT doc_id,
           NULLIF(TRIM(' ' || lang || chr(9), ' ' || chr(9) || chr(10) || chr(13)),
                  '') AS lang_ascii_clean,
           NULLIF(TRIM(chr(160) || chr(9) || lang || ' ' || chr(12288),
                       ' ' || chr(9) || chr(10) || chr(13) || chr(160) || chr(12288)),
                  '') AS lang_uni_clean,
           UPPER(source) AS source_uc
    FROM documents
    """,
)
def p2_trim_null_projection(spark, sf_dir):
    """P2 safe_get trim-to-null (reference log_processor.py:391-397),
    rotated BACK into the driver window in r4 because py_strip changed
    twice since its last driver row (exact-Unicode parity in r3, the
    dual ASCII/Unicode path in r4). The two columns force BOTH branches:
    ascii padding (\\t, space) keeps the row on the Java-\\s fast path;
    NBSP + ideographic-space padding forces the exact 20-range Python-ws
    path. The DuckDB oracle strips the same explicit char sets."""
    from illumio_spark.functions.format import py_strip

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.nullif(
            py_strip(F.concat(F.lit(" "), F.col("lang"), F.lit("\t"))), F.lit("")
        ).alias("lang_ascii_clean"),
        F.nullif(
            py_strip(F.concat(F.lit("\xa0\t"), F.col("lang"), F.lit(" 　"))),
            F.lit(""),
        ).alias("lang_uni_clean"),
        F.upper("source").alias("source_uc"),
    )


def s15_head_sample(spark, sf_dir):
    # reference: first-N lines per folder (S15, s3_analyzer.py:56-131);
    # the projected columns exercise the P2 safe_get trim-to-null getter +
    # case normalization (log_processor.py:391-397)
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "source",
            "doc_id",
            F.substring("text", 1, 40).alias("head"),
            F.nullif(F.trim("lang"), F.lit("")).alias("lang_clean"),
            F.upper("source").alias("source_uc"),
        )
    )


# (S16's poll-interval rate monitor is covered by a10_s16_rate_monitor in
# catalog.py — per-class, epoch-aligned interval rates in one groupBy)


# p3_audit_projection was driver-green r2-r6 with unchanged code; rotated
# out late-r6 for the chunk/top-frac/shard rows (p1/p4/p7b keep the parse
# family in the window). Still oracle-checked every pytest run via
# tests/test_retired_queries.py.
P3_SQL = """
    SELECT event_id AS id, event_type AS vmid,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS time,
           CAST(value AS VARCHAR) AS amount
    FROM events WHERE event_id < 2000
    """


def p3_audit_projection(spark, sf_dir):
    # reference: audit rename-map w/ stringified numerics
    # (log_processor.py:399-409 P3 + :433 stringification)
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("vmid"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("time"),
        F.col("value").cast("string").alias("amount"),
    )


@q(
    "p4_nested_extraction",
    """
    WITH j AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN '{"notifications":[]}'
                    ELSE '{"notifications":[{"notification_type":"' || event_type ||
                         '","info":{"src_ip":"10.0.' || CAST(event_id % 256 AS VARCHAR) ||
                         '.1","api_endpoint":"/v1/ep' || CAST(event_id % 5 AS VARCHAR) ||
                         '","api_method":"GET"}}]}'
               END AS payload
        FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           json_extract_string(payload, '$.notifications[0].notification_type') AS ntype,
           json_extract_string(payload, '$.notifications[0].info.src_ip') AS sip,
           json_extract_string(payload, '$.notifications[0].info.api_endpoint') AS endpoint,
           json_extract_string(payload, '$.notifications[0].info.api_method') AS method
    FROM j
    """,
)
def p4_nested_extraction(spark, sf_dir):
    # reference: notifications[0].info.{src_ip,api_endpoint,api_method} →
    # sip/tag2/tag3 (app/log_processor.py:410-419). from_json with
    # ArrayType(StructType) + nested path extraction, all JVM-side; the
    # event_id % 7 branch exercises the empty-array → null path.
    from pyspark.sql import types as T

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.when(
        F.col("event_id") % 7 == 0, F.lit('{"notifications":[]}')
    ).otherwise(
        F.concat(
            F.lit('{"notifications":[{"notification_type":"'),
            F.col("event_type"),
            F.lit('","info":{"src_ip":"10.0.'),
            (F.col("event_id") % 256).cast("string"),
            F.lit('.1","api_endpoint":"/v1/ep'),
            (F.col("event_id") % 5).cast("string"),
            F.lit('","api_method":"GET"}}]}'),
        )
    )
    schema = T.StructType(
        [
            T.StructField(
                "notifications",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("notification_type", T.StringType()),
                            T.StructField(
                                "info",
                                T.StructType(
                                    [
                                        T.StructField("src_ip", T.StringType()),
                                        T.StructField("api_endpoint", T.StringType()),
                                        T.StructField("api_method", T.StringType()),
                                    ]
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )
    n0 = F.get(F.from_json(payload, schema)["notifications"], F.lit(0))
    return ev.select(
        "event_id",
        n0["notification_type"].alias("ntype"),
        n0["info"]["src_ip"].alias("sip"),
        n0["info"]["api_endpoint"].alias("endpoint"),
        n0["info"]["api_method"].alias("method"),
    )


@q(
    "p7b_real_map_fold",
    """
    SELECT event_id,
           'Source: type=' || event_type || ', uid=' || CAST(user_id AS VARCHAR) ||
           ', day=' || strftime(ts, '%Y-%m-%d') AS label_str
    FROM events WHERE event_id < 2000
    """,
)
def p7b_real_map_fold(spark, sf_dir):
    # reference: src_labels map<string,string> → 'Source: k=v, k=v' fold
    # skipping empty values (app/log_processor.py:452-459). The Spark side
    # flows a REAL MapType column (from_json → map<string,string> →
    # map_entries fold); the empty 'note' entry exercises the if-v skip.
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    j = F.concat(
        F.lit('{"type":"'), F.col("event_type"),
        F.lit('","uid":"'), F.col("user_id").cast("string"),
        F.lit('","note":"","day":"'), F.date_format("ts", "yyyy-MM-dd"),
        F.lit('"}'),
    )
    m = F.from_json(j, "map<string,string>")
    entries = F.filter(F.map_entries(m), lambda e: e["value"] != "")
    folded = F.concat_ws(
        ", ", F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"]))
    )
    return ev.select("event_id", F.concat(F.lit("Source: "), folded).alias("label_str"))


_Q5_SQL = """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


# sql_q5 was driver-green r2-r4 with unchanged code; rotated out in r5 for
# the codec oracle rows (VERDICT r4 task 4). Still oracle-checked every
# pytest run via tests/test_retired_queries.py (_Q5_SQL above is the oracle).
def sql_q5_local_supplier(spark, sf_dir):
    # the SQL-API surface: the SAME ANSI SQL text runs on both engines —
    # spark.sql over temp views vs DuckDB over the same parquet. Catalyst
    # broadcast-plans the dims and reorders the join chain for free.
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region"]:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5_SQL)


# set_intersect was driver-green r1-r4 with unchanged code; rotated out in
# r5 for the text-hygiene trio (VERDICT r4 task 1). Still oracle-checked
# every pytest run via tests/test_retired_queries.py against this SQL.
SET_INTERSECT_SQL = """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """


def set_intersect_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select("user_id").intersect(
        ev.filter(F.col("event_type") == "purchase").select("user_id")
    )


# set_except_events was driver-green r2-r6 with unchanged code (a direct
# DataFrame.subtract, EXCEPT-distinct semantics); rotated out late-r6 for
# the mixture-materialization rows (td_apply_mixture, td_token_budget).
# Still oracle-checked every pytest run via tests/test_retired_queries.py.
SET_EXCEPT_SQL = """
    SELECT event_id FROM events WHERE value > 480
    EXCEPT
    SELECT event_id FROM events WHERE event_type = 'error'
    """


def set_except_events(spark, sf_dir):
    # high-value events that are not error-class (EXCEPT-distinct semantics)
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value") > 480).select("event_id").subtract(
        ev.filter(F.col("event_type") == "error").select("event_id")
    )


# (td_minhash_lsh_pairs carries its full md5-minhash DuckDB oracle in
# catalog_td.py — the former separate *_oracle variant was folded into it)
