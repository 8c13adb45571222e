"""Data model: transcript schema + syslog priority model.

The reference's LogMessage (see /root/reference/lib/logmsg/logmsg.h:240-325)
is a row with fixed builtin fields plus a dynamic string name-value table.
Here the outer schema is fixed and columnar (BASELINE.json input_hint):
``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp`` — parsers promote extracted values into an ``nv``
map<string,string> column and typed top-level columns; tags are an
array<string> column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- transcripts (primary corpus) -------------------------------------------

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

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "browser", "editor", "python", "none"]

# Columns added by the engine (never mutating the original six — the
# per-turn text-equality invariant rides on `text` staying untouched).
NV_COL = "nv"  # map<string,string> — NVTable analogue
TAGS_COL = "tags"  # array<string> — tag bitset analogue
MATCHES_COL = "matches"  # array<string> — $0..$n regexp capture slots

# --- syslog priority model ---------------------------------------------------
# facility*8 + severity, reference lib/syslog-names.c (public RFC5424 tables)

FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]

SEVERITIES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]

FACILITY_CODE = {name: i for i, name in enumerate(FACILITIES)}
SEVERITY_CODE = {name: i for i, name in enumerate(SEVERITIES)}

# Aliases accepted by the reference's filter grammar.
SEVERITY_ALIASES = {
    "error": "err", "warn": "warning", "emergency": "emerg",
    "panic": "emerg", "critical": "crit",
}


def severity_code(name: str) -> int:
    return SEVERITY_CODE[SEVERITY_ALIASES.get(name, name)]


def facility_code(name: str) -> int:
    return FACILITY_CODE[name]


# Tags set by the syslog header parser on malformed input, mirroring the
# reference's LM_T_SYSLOG_* error tags (lib/logmsg/logmsg.h:107-143).
TAG_MISSING_PRI = "syslog.missing_pri"
TAG_MISSING_TIMESTAMP = "syslog.missing_timestamp"
TAG_MISSING_HOSTNAME = "syslog.missing_hostname"
TAG_UNEXPECTED_FRAMING = "syslog.unexpected_framing"
TAG_INVALID_VERSION = "syslog.invalid_version"
TAG_INVALID_PRI = "syslog.invalid_pri"
TAG_INVALID_PROGRAM = "syslog.rfc3164_invalid_program"
TAG_MISSING_HEADER = "syslog.rfc3164_missing_header"
