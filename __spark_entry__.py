"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship parse→enrich→route→aggregate query on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + td_*).
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# importing the catalog modules populates the shared QUERIES registry
from illumio_spark.queries.catalog import QUERIES, load  # noqa: E402
import illumio_spark.queries.catalog_td  # noqa: F401,E402
import illumio_spark.queries.catalog_pipeline  # noqa: F401,E402
import illumio_spark.queries.catalog_ext  # noqa: F401,E402

SF_SMOKE = "/root/testdata/sf0.001"

# The driver's correctness harness evaluates the FIRST 50 registry entries;
# keep the registry at ≤ 50 and surface the queries that most need fresh
# driver rows first (round-2 lesson: 6 entries past the window shipped
# driver-unverified). tools/selfcheck.py asserts both invariants.
DRIVER_WINDOW = 50
PRIORITY = [
    # r7 rotations: the cross-run near-dup frontier, the ExactSubstr
    # remediation output, and the leakage-safe grouped split cross the
    # driver gate (out: td_resize_stats, td_token_percentiles,
    # td_frame_sample — driver-green r5-r6, now in
    # tests/test_retired_queries.py)
    # late r7: frontier compaction and the embedding frontier cross the
    # gate (out: td_ann_lsh_topk r4-r7 and td_hash_embed_pairs r3-r7,
    # both in tests/test_retired_queries.py) — compaction also pins
    # star-edge CC == pairwise transitive closure cross-engine
    "td_incremental_embedding",  # embedding signature frontier (new r7)
    "td_compact_frontier",  # canonical keepers from persisted bands (new r7)
    "td_incremental_neardup",  # minhash-LSH signature frontier (new r7)
    "td_cut_spans",  # rebuilt text after span excision (new r7)
    "td_split_grouped",  # cluster-coherent train/val/test (new r7)
    # late-r6 rotations: corpus-assembly operators cross the driver gate
    # (out: td_media_sniff, td_quality_score, td_ngram_jaccard,
    # set_except_events, p3_audit_projection, a3_report,
    # a8_running_max_merge, a10_s16_rate_monitor — stable since r2/r3,
    # now in tests/test_retired_queries.py)
    "td_split_corpus",  # deterministic train/val/test split (new r6)
    "td_chunk_documents",  # sliding-window chunker w/ overlap (new r6)
    "td_top_frac",  # per-stratum quantile-threshold selection (new r6)
    "td_shuffle_shards",  # deterministic training-order shuffle (new r6)
    "td_apply_mixture",  # deterministic mixture materialization (new r6)
    "td_token_budget",  # greedy per-source fill-until-full (new r6)
    "td_mixture_weights",  # data-mixing weights vs normalized targets (new r6)
    "td_pack_chunks",  # concat-and-chunk packing coordinates (new r6)
    # r6 rotations: the last two pytest-only operators cross the driver gate,
    # plus the new span-level ExactSubstr output (replaces retired td_token_count)
    "td_verbatim_spans",  # maximal shared k-gram runs w/ positions (new r6)
    "td_verbatim_overlap",  # ExactSubstr k-gram overlap pairs (new r6)
    "td_url_domains",  # URL/domain analysis, doc+corpus scopes folded (new r6)
    # r5 rotations: fresh driver rows for the code that changed this round
    "td_bigram_lm",  # corpus bigram LM, 1e-6-grid quantized sums (new r5)
    "td_pii_scrub",  # precedence-aware PII counts + md5 of redacted text (r5)
    "td_repetition_signals",  # Gopher dup-line / top-bigram fractions (r5)
    "td_c4_filters",  # C4/Gopher page-quality filters + keep flag (new r5)
    "td_session_gaps",  # F.session_window vs gap-and-islands oracle (new r5)
    "td_neardup_components",  # CC labels vs recursive-CTE closure (new r5)
    "td_audio_features",  # WAV RMS/ZCR exact + DFT-oracled centroid (r5)
    "td_decode_stats",  # real PNG/WAV/GIF-LZW/JPEG codec corpus (r4)
    "p2_trim_null_projection",  # py_strip dual ASCII/Unicode path (r4)
    "td_decontaminate",  # 13-gram test-set decontamination (r4)
    "td_ann_ivf_topk",  # IVF cell-join ANN, integer-exact oracle (r4)
    "p4_nested_extraction",
    "p7b_real_map_fold",
    "td_sessionize",
    "a2b_rollup_delta",
]


def _ordered() -> dict[str, tuple]:
    missing = [n for n in PRIORITY if n not in QUERIES]
    assert not missing, f"PRIORITY names missing from registry: {missing}"
    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"{len(QUERIES)} queries registered; the driver only checks the "
        f"first {DRIVER_WINDOW} — fold or retire entries"
    )
    out = {n: QUERIES[n] for n in PRIORITY}
    out.update({n: v for n, v in QUERIES.items() if n not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's parse → enrich → route → aggregate shape
    over the events table (parse JSON props, broadcast-enrich severity,
    CASE route, rollup counts per route/severity)."""
    ev = load(spark, SF_SMOKE, "events")
    severity_lookup = spark.createDataFrame(
        [
            ("error", "high"),
            ("signup", "medium"),
            ("purchase", "medium"),
            ("click", "low"),
            ("view", "low"),
        ],
        "lk_event_type string, severity string",
    )
    parsed = ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    enriched = parsed.join(
        F.broadcast(severity_lookup), parsed.event_type == F.col("lk_event_type"), "left"
    )
    route = (
        F.when(F.col("k").isNull(), "dead_letter")
        .when(F.col("event_type").isin("error", "signup"), "auditable")
        .otherwise("summary")
        .alias("route")
    )
    return enriched.groupBy(route, F.col("severity")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ordered().items() if sql is not None}
