"""Single-process pure-Python oracle for the transcript pipeline.

Faithful transliteration of the reference's transform/format semantics
(app/log_processor.py:368-497) to the transcript domain — this is the
byte-equality target the Spark pipeline is tested against (SURVEY.md §5.2).

Semantics mirrored:
  - safe_get trim-to-null (app/log_processor.py:391-397)
  - per-class field projection with int stringification
    (app/log_processor.py:399-446)
  - null dropping on merge (app/log_processor.py:420,461)
  - tag1 overwritten with device_type (app/log_processor.py:464)
  - fixed FIELD_ORDER whitelist re-ordering (app/log_processor.py:466-474)
  - k=v '|'-join with '|'→'_' value escaping (app/log_processor.py:480-487)
  - original-message escape + truncate to MAX_MESSAGE_LENGTH budget
    (app/log_processor.py:489-497); divergence: the truncation keep-length
    is clamped at 0 (the reference's unguarded negative slice is a bug)
  - deterministic syslog envelope '{%b %d %Y %H:%M:%S} {host} <USER:NOTE> '
    derived from the event ts instead of wall clock
    (app/log_processor.py:254-256; SURVEY.md §7 risk register)
"""

from __future__ import annotations

import json
import re

import pandas as pd

from illumio_spark import schema as S

_SUMMARY_RE = re.compile(S.SUMMARY_TEXT_REGEX)


def safe_get(d: dict, key: str):
    v = d.get(key)
    if v is None:
        return None
    if isinstance(v, str):
        return v.strip() or None
    return v


def parse_text(text: str | None):
    """Classify + parse one turn's text.

    Returns (event_class, parsed_fields) where event_class is
    'summary' | 'auditable' | None; when None, parsed_fields is the
    dead-letter error reason.
    """
    if text is None or text.strip() == "":
        return None, S.ERROR_EMPTY
    m = _SUMMARY_RE.match(text)
    if m:
        return S.CLASS_SUMMARY, m.groupdict()
    try:
        obj = json.loads(text)
    except (json.JSONDecodeError, ValueError):
        return None, S.ERROR_UNPARSEABLE
    if isinstance(obj, dict) and safe_get(obj, "event_type") is not None:
        return S.CLASS_AUDITABLE, obj
    return None, S.ERROR_UNPARSEABLE


def _ts_iso(ts) -> str:
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%S")


def transform_turn(row: dict, event_class: str, parsed: dict,
                   lookup_event: dict, lookup_sev: dict) -> dict:
    """app/log_processor.py:368-478 on the transcript domain.

    Returns the ordered transformed dict plus routing metadata in
    '_event_type'/'_severity' (stripped before formatting).
    """
    is_audit = event_class == S.CLASS_AUDITABLE
    device_type = S.DEVICE_TYPE_AUDIT if is_audit else S.DEVICE_TYPE_SUMMARY
    result: dict = {
        "beatname": S.BEATNAME,
        "device_type": device_type,
        "fullyqualifiedbeatname": S.BEATNAME,
    }

    role = safe_get(row, "role")
    tool = safe_get(row, "tool")

    if is_audit:
        event_type = safe_get(parsed, "event_type")
        severity = safe_get(parsed, "severity")
        fields = {
            "time": _ts_iso(row["ts"]),
            "objectname": safe_get(row, "conv_id"),
            "version": str(row["turn_idx"]),
            "result": safe_get(parsed, "status"),
            "severity": severity,
            "action": safe_get(parsed, "action"),
            "vmid": event_type,
            "process": tool,
            "login": role,
        }
        # nested array<struct> extraction (app/log_processor.py:410-419):
        # first notification's info drives sip/command/tag2/tag3; tag1 gets
        # notification_type here but is ALWAYS overwritten by device_type
        # below (the reference quirk at app/log_processor.py:464)
        if parsed.get("notifications"):
            notification = parsed["notifications"][0]
            info = notification.get("info") or {}
            fields.update(
                {
                    "sip": safe_get(info, "src_ip"),
                    "command": safe_get(info, "api_method"),
                    "tag1": safe_get(notification, "notification_type"),
                    "tag2": safe_get(info, "api_endpoint"),
                    "tag3": safe_get(info, "api_method"),
                }
            )
        # map<string,string> labels fold (app/log_processor.py:452-459):
        # 'k=v, k=v' skipping empty values, emitted only when non-empty
        labels = parsed.get("labels") or {}
        if isinstance(labels, dict):
            label_info = ", ".join(f"{k}={v}" for k, v in labels.items() if v)
            if label_info:
                fields["tag4"] = f"Source: {label_info}"
    else:
        event_type = lookup_event.get((role, tool))
        severity = lookup_sev.get(event_type)
        fields = {
            "time": _ts_iso(row["ts"]),
            "object": safe_get(parsed, "sn"),
            "objectname": safe_get(row, "conv_id"),
            "objecttype": safe_get(parsed, "act"),
            "version": str(row["turn_idx"]),
            "quantity": safe_get(parsed, "count"),
            "seconds": safe_get(parsed, "interval_sec"),
            "kilobytesin": safe_get(parsed, "bytes_in"),
            "kilobytesout": safe_get(parsed, "bytes_out"),
            "status": safe_get(parsed, "state"),
            "reason": safe_get(parsed, "msg"),
            "vendorinfo": event_type,
            "severity": severity,
            "sessiontype": "interactive" if role == "user" else "automated",
            "process": tool,
            "login": role,
        }

    result.update({k: v for k, v in fields.items() if v is not None})
    result["tag1"] = device_type  # overwrite, app/log_processor.py:464

    ordered = {
        "beatname": S.BEATNAME,
        "device_type": result["device_type"],
        "fullyqualifiedbeatname": S.BEATNAME,
    }
    for f in S.FIELD_ORDER:
        if f in result and result[f] is not None:
            ordered[f] = result[f]
    ordered["original_message"] = ""
    ordered["_event_type"] = event_type
    ordered["_severity"] = severity
    return ordered


def format_routed(transformed: dict, raw_text: str) -> str:
    """app/log_processor.py:480-497 with raw text as original payload."""
    parts = []
    for k, v in transformed.items():
        if k.startswith("_"):
            continue
        if v is not None and v != "":
            parts.append(f"{k}={str(v).replace('|', '_')}")
    formatted = "|".join(parts)

    escaped = raw_text.replace("|", "_")
    max_original = S.MAX_MESSAGE_LENGTH - len(formatted) - len("|original_message=")
    if len(escaped) > max_original:
        keep = max(max_original - 3, 0)
        escaped = escaped[:keep] + "..."
    return f"{formatted}|original_message={escaped}"


def envelope(ts, payload: str) -> str:
    stamp = pd.Timestamp(ts).strftime("%b %d %Y %H:%M:%S")
    return f"{stamp} {S.SYSLOG_HOST} {S.SYSLOG_NOTE} {payload}"


def run(pdf: pd.DataFrame, run_id: str = "oracle") -> dict[str, pd.DataFrame]:
    """Full-pipeline oracle: transcripts → routed/dead_letter/rollups."""
    lookup_event = {(r, t): e for r, t, e in S.role_tool_event_rows()}
    lookup_sev = {e: sv for e, sv, _ in S.severity_rows()}

    routed_rows, dead_rows = [], []
    for row in pdf.to_dict("records"):
        event_class, parsed = parse_text(row["text"])
        if event_class is None:
            dead_rows.append(
                {
                    "conv_id": row["conv_id"],
                    "turn_idx": row["turn_idx"],
                    "raw_text": row["text"],
                    "error_reason": parsed,
                    "ts": row["ts"],
                }
            )
            continue
        transformed = transform_turn(row, event_class, parsed, lookup_event, lookup_sev)
        payload = format_routed(transformed, row["text"])
        routed_rows.append(
            {
                "conv_id": row["conv_id"],
                "turn_idx": row["turn_idx"],
                "event_class": event_class,
                "event_type": transformed["_event_type"],
                "severity": transformed["_severity"],
                "routed_text": envelope(row["ts"], payload),
                "ts": row["ts"],
            }
        )

    routed = pd.DataFrame(
        routed_rows,
        columns=["conv_id", "turn_idx", "event_class", "event_type", "severity", "routed_text", "ts"],
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dead = pd.DataFrame(
        dead_rows, columns=["conv_id", "turn_idx", "raw_text", "error_reason", "ts"]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    rollup_rows = [
        {"event_class": ec, "sink": "routed_events", "n_rows": int(n), "run_id": run_id}
        for ec, n in routed.groupby("event_class").size().items()
    ]
    rollup_rows += [
        {"event_class": None, "sink": "dead_letter", "n_rows": int(len(dead)), "run_id": run_id}
    ]
    rollups = pd.DataFrame(rollup_rows, columns=["event_class", "sink", "n_rows", "run_id"])
    return {"routed_events": routed, "dead_letter": dead, "rollups": rollups}
