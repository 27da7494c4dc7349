"""Canonical schemas, field maps and lookup-table data.

Single source of truth shared by the pure-Python oracle (``oracle.py``)
and the Spark pipeline (``plans/pipeline.py``) so that routed rows are
byte-equal between the two.

Reference parity notes (file:line cite the reference at /root/reference):
  - FIELD_ORDER mirrors the 80-field SIEM whitelist of
    app/log_processor.py:379-389 — canonical output column order; fields
    not in the whitelist are dropped (P10 in SURVEY.md §2.2).
  - BEATNAME / device_type / fullyqualifiedbeatname constants mirror
    app/log_processor.py:372-376 (P9).
  - tag1 is ALWAYS overwritten with device_type, even when the audit
    branch set it from a notification (app/log_processor.py:464).
  - MAX_MESSAGE_LENGTH truncation contract mirrors
    app/log_processor.py:489-497 (F2).
  - The (role, tool) → event_type and event_type → severity lookups are
    the transcript-domain analog of the reference's hard-coded
    log_type → device_type and proto → protname maps
    (app/log_processor.py:370,448-450 — J1 in SURVEY.md §2.3), upgraded
    to broadcast joins per the north rule.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input table (shape fixed by BASELINE.json input_hint)
# ---------------------------------------------------------------------------

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

ROLES = ["user", "assistant", "tool", "system"]
ROLE_WEIGHTS = [0.30, 0.40, 0.25, 0.05]
TOOLS = ["search", "code_exec", "file_read", "file_write", "http_get", "auth", "db_query"]

# ---------------------------------------------------------------------------
# Routing / format constants (reference app/log_processor.py:372-376, 493)
# ---------------------------------------------------------------------------

BEATNAME = "webhookbeat_transcripts"
DEVICE_TYPE_AUDIT = "TranscriptAudit"
DEVICE_TYPE_SUMMARY = "TranscriptSummary"
MAX_MESSAGE_LENGTH = 2048  # settings.ini:67 / app/config.py:88
SYSLOG_HOST = "10.0.0.1"  # deterministic stand-in for the resolved host IP
SYSLOG_NOTE = "<USER:NOTE>"  # app/log_processor.py:254-256

CLASS_SUMMARY = "summary"
CLASS_AUDITABLE = "auditable"

# Canonical SIEM field whitelist — output order (app/log_processor.py:379-389)
FIELD_ORDER = [
    "time", "object", "objectname", "objecttype", "hash", "policy", "result",
    "url", "useragent", "responsecode", "subject", "version", "command",
    "reason", "action", "status", "sessiontype", "process", "processid",
    "parentprocessid", "parentprocessname", "parentprocesspath", "quantity",
    "amount", "size", "rate", "minutes", "seconds", "milliseconds", "session",
    "kilobytesin", "kilobytesout", "kilobytes", "packetsin", "packetsout",
    "severity", "vmid", "vendorinfo", "threatname", "threatid", "cve", "smac",
    "dmac", "sinterface", "dinterface", "sip", "dip", "snatip", "dnatip",
    "sname", "dname", "serialnumber", "login", "account", "sender",
    "recipient", "group", "domainimpacted", "domainorigin", "protnum",
    "protname", "sport", "dport", "snatport", "dnatport", "augmented", "tag1",
    "tag2", "tag3", "tag4", "tag5", "tag6", "tag7", "tag8", "tag9", "tag10",
]

# ---------------------------------------------------------------------------
# Summary-class text payload: k=v grok fields (FIXTURES.md §A)
#   act=<w> sn=<w> count=<int> interval_sec=<int> bytes_in=<int>
#   bytes_out=<int> state=<w> msg=<free text to end of line>
# ---------------------------------------------------------------------------

SUMMARY_TEXT_FIELDS = ["act", "sn", "count", "interval_sec", "bytes_in", "bytes_out", "state", "msg"]
SUMMARY_TEXT_REGEX = (
    r"^act=(?P<act>\S+) sn=(?P<sn>\S+) count=(?P<count>\d+)"
    r" interval_sec=(?P<interval_sec>\d+) bytes_in=(?P<bytes_in>\d+)"
    r" bytes_out=(?P<bytes_out>\d+) state=(?P<state>\S+) msg=(?P<msg>.*)$"
)

# Audit-class text payload: JSON object with the reference's NESTED shape
# (app/log_processor.py:410-419): notifications is array<struct> whose first
# element carries the SIEM sip/command/tag2/tag3 sources, and labels is a
# genuine map<string,string> (the reference's src_labels,
# app/log_processor.py:452-455) folded into tag4.
AUDIT_INFO_SCHEMA = T.StructType(
    [
        T.StructField("src_ip", T.StringType(), True),
        T.StructField("api_endpoint", T.StringType(), True),
        T.StructField("api_method", T.StringType(), True),
    ]
)
AUDIT_NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("notification_type", T.StringType(), True),
        T.StructField("info", AUDIT_INFO_SCHEMA, True),
    ]
)
AUDIT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("notifications", T.ArrayType(AUDIT_NOTIFICATION_SCHEMA), True),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# Enrichment lookup data (broadcast side; FIXTURES.md §B)
# ---------------------------------------------------------------------------


def role_tool_event_rows() -> list[tuple[str, str, str]]:
    """(role, tool, event_type) — full cross of vocab plus the no-tool row."""
    rows = []
    for role in ROLES:
        for tool in [*TOOLS, None]:
            event_type = f"{role}.{tool or 'message'}"
            rows.append((role, tool, event_type))
    return rows


def severity_rows() -> list[tuple[str, str, str]]:
    """(event_type, severity, event_class_hint)."""
    rows = []
    for role, tool, event_type in role_tool_event_rows():
        if tool == "auth":
            sev, cls = "high", CLASS_AUDITABLE
        elif tool in ("code_exec", "file_write"):
            sev, cls = "medium", CLASS_SUMMARY
        elif role == "system":
            sev, cls = "notice", CLASS_SUMMARY
        else:
            sev, cls = "info", CLASS_SUMMARY
        rows.append((event_type, sev, cls))
    return rows


ROLE_TOOL_EVENT_COLUMNS = ["role", "tool", "event_type"]
SEVERITY_COLUMNS = ["event_type", "severity", "event_class_hint"]

# ---------------------------------------------------------------------------
# Output sink schemas (FIXTURES.md §C)
# ---------------------------------------------------------------------------

ROUTED_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("event_class", T.StringType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("routed_text", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

DEAD_LETTER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("raw_text", T.StringType(), True),
        T.StructField("error_reason", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

ROLLUPS_SCHEMA = T.StructType(
    [
        T.StructField("event_class", T.StringType(), True),
        T.StructField("sink", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("max_ts", T.TimestampType(), True),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("lineage_id", T.StringType(), False),
    ]
)

ERROR_EMPTY = "empty_text"
ERROR_UNPARSEABLE = "unparseable"
