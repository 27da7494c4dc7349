"""Deterministic synthetic transcript generator (FIXTURES.md §A).

Every conversation is generated from a seed derived only from its index,
so output is identical regardless of chunking/partitioning — the driver
(pandas) path and the distributed (mapInPandas over ``spark.range``) path
produce the same rows. Seed = 42.

Payload classes mirror the reference's two record classes
(summaries vs auditable_events, app/log_processor.py:399-461) plus a
malformed fraction for the dead-letter path (app/log_processor.py:353-354).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from illumio_spark import schema as S

SEED = 42
EPOCH = np.datetime64("2026-01-01T00:00:00", "us")
SPREAD_DAYS = 30

ACTS = ["completion", "retrieval", "tool_call", "handoff"]
STATES = ["ok", "error", "partial"]
AUDIT_EVENT_TYPES = [
    "request.authentication_failed",
    "request.authorization_denied",
    "user.login",
    "api.rate_limited",
    "policy.violation",
]
AUDIT_SEVERITIES = ["info", "warning", "error", "critical"]
AUDIT_STATUSES = ["success", "failure"]
AUDIT_ACTIONS = ["login", "create", "update", "delete"]
API_METHODS = ["GET", "POST", "PUT", "DELETE"]
API_ENDPOINTS = ["/v1/login", "/v1/query", "/v1/files", "/v1/exec", "/v1/admin"]
NOTIFICATION_TYPES = ["api_request", "policy_check", "auth_attempt"]
LABEL_KEYS = ["env", "team", "zone"]
LABEL_VALS = ["prod", "staging", "core", "ml", "edge", ""]  # "" exercises the if-v skip
MSG_WORDS = [
    "retry", "latency", "cache", "token", "shard", "merge", "flaky", "stable",
    "upstream", "fallback", "vector", "batch", "stream", "window", "agg",
    "pipe|line", "k=v", "done",  # '|' and '=' exercise escaping (F1/F2)
]
MALFORMED = [
    "",
    "   ",
    '{"event_type":"user.login","severity":"warn',  # truncated JSON
    "garbage text with no recognizable structure at all",
    "act=incomplete sn=only-two-fields",
    '{"severity":"high","status":"failure"}',  # valid JSON, no event_type
]

# empirical mean of the clipped-zipf turn count below (used to size the hot
# conversation in one pass, keeping generation deterministic & partitionable)
MEAN_TURNS = 13.3


def _conv_rng(conv_idx: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(SEED * 1_000_003 + conv_idx))


def _n_turns(rng: np.random.Generator) -> int:
    return int(np.clip(rng.zipf(1.6), 1, 200))


def _gen_conversation(conv_idx: int, n_turns: int | None = None) -> pd.DataFrame:
    rng = _conv_rng(conv_idx)
    n = n_turns if n_turns is not None else _n_turns(rng)
    conv_id = f"conv-{conv_idx:08d}"

    roles = rng.choice(S.ROLES, p=S.ROLE_WEIGHTS, size=n)
    tool_pool = np.array(S.TOOLS + ["__none__"], dtype=object)
    tool_p = np.array([0.18, 0.16, 0.14, 0.10, 0.14, 0.04, 0.12, 0.12])
    tools = rng.choice(tool_pool, p=tool_p, size=n)
    tools = np.where(np.isin(roles, ["user", "system"]), None, tools)
    tools = np.where(tools == "__none__", None, tools)

    # class selection: auth tool → auditable; else 1% malformed, 8% auditable
    u = rng.random(n)
    is_audit = (tools == "auth") | (u < 0.08)
    is_malformed = (~is_audit) & (u >= 0.08) & (u < 0.09)

    start = EPOCH + np.timedelta64(int(rng.integers(0, SPREAD_DAYS * 86400)), "s")
    deltas = rng.integers(1, 301, size=n).cumsum()
    ts = start + deltas.astype("timedelta64[s]")

    texts = np.empty(n, dtype=object)
    for i in range(n):
        if is_malformed[i]:
            texts[i] = MALFORMED[int(rng.integers(0, len(MALFORMED)))]
        elif is_audit[i]:
            # nested shape mirroring the reference auditable_event
            # (app/log_processor.py:399-419): array<struct> notifications
            # (sometimes empty — exercises the null nested path) + a real
            # map<string,string> labels object (app/log_processor.py:452-455)
            obj = {
                "event_type": AUDIT_EVENT_TYPES[int(rng.integers(0, len(AUDIT_EVENT_TYPES)))],
                "severity": AUDIT_SEVERITIES[int(rng.integers(0, len(AUDIT_SEVERITIES)))],
                "status": AUDIT_STATUSES[int(rng.integers(0, len(AUDIT_STATUSES)))],
                "action": AUDIT_ACTIONS[int(rng.integers(0, len(AUDIT_ACTIONS)))],
            }
            if rng.random() >= 0.15:
                src = f"10.{rng.integers(0,256)}.{rng.integers(0,256)}.{rng.integers(1,255)}"
                obj["notifications"] = [
                    {
                        "notification_type": NOTIFICATION_TYPES[
                            int(rng.integers(0, len(NOTIFICATION_TYPES)))
                        ],
                        "info": {
                            "src_ip": src,
                            "api_endpoint": API_ENDPOINTS[int(rng.integers(0, len(API_ENDPOINTS)))],
                            "api_method": API_METHODS[int(rng.integers(0, len(API_METHODS)))],
                        },
                    }
                ]
            n_labels = int(rng.integers(0, len(LABEL_KEYS) + 1))
            if n_labels:
                obj["labels"] = {
                    k: LABEL_VALS[int(rng.integers(0, len(LABEL_VALS)))]
                    for k in LABEL_KEYS[:n_labels]
                }
            texts[i] = json.dumps(obj, separators=(",", ":"))
        else:
            act = ACTS[int(rng.integers(0, len(ACTS)))]
            state = STATES[int(rng.integers(0, len(STATES)))]
            n_words = int(rng.integers(3, 15))
            # rare very-long msg exercises the MAX_MESSAGE_LENGTH truncation
            if rng.random() < 0.01:
                n_words = 400
            msg = " ".join(
                MSG_WORDS[int(w)] for w in rng.integers(0, len(MSG_WORDS), n_words)
            )
            texts[i] = (
                f"act={act} sn=sess-{conv_idx:06d} count={rng.integers(1, 51)}"
                f" interval_sec={rng.integers(1, 601)} bytes_in={rng.integers(0, 1 << 20)}"
                f" bytes_out={rng.integers(0, 1 << 21)} state={state} msg={msg}"
            )

    return pd.DataFrame(
        {
            "conv_id": np.repeat(conv_id, n),
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.Series(ts, dtype="datetime64[us]"),
        }
    )


def hot_conv_turns(n_conv: int, hot_frac: float) -> int:
    """Turns for the designated hot conversation (index 0), sized so it holds
    ~hot_frac of all turns — computed from the analytic mean so generation
    stays one-pass and partition-independent."""
    if hot_frac <= 0:
        return 0
    regular = MEAN_TURNS * max(n_conv - 1, 1)
    return max(int(regular * hot_frac / (1.0 - hot_frac)), 1)


def generate_pandas(n_conv: int, hot_frac: float = 0.0) -> pd.DataFrame:
    """Driver-side generation (tests / small scales)."""
    blocks = []
    for i in range(n_conv):
        n = hot_conv_turns(n_conv, hot_frac) if (i == 0 and hot_frac > 0) else None
        blocks.append(_gen_conversation(i, n))
    out = pd.concat(blocks, ignore_index=True)
    return out


def generate_spark(spark, n_conv: int, hot_frac: float = 0.0, parallelism: int | None = None):
    """Distributed generation: mapInPandas over spark.range(n_conv).

    Deterministic per conversation — identical to generate_pandas for the
    same (n_conv, hot_frac) regardless of partition count.
    """
    hot_n = hot_conv_turns(n_conv, hot_frac) if hot_frac > 0 else 0

    def gen(batches):
        for pdf in batches:
            for conv_idx in pdf["id"].tolist():
                n = hot_n if (conv_idx == 0 and hot_n) else None
                yield _gen_conversation(int(conv_idx), n)

    rng_df = spark.range(n_conv)
    if parallelism:
        rng_df = rng_df.repartition(parallelism)
    return rng_df.mapInPandas(gen, schema=S.TRANSCRIPT_SCHEMA)


def write_parquet(pdf: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, path)
