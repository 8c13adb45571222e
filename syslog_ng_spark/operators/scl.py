"""SCL presets: config-library parsers composed from base operators,
mirroring the reference's scl/ blocks (apache-accesslog-parser,
cisco-parser, postgresql-csvlog shapes). Each is just a composition —
the same thing the reference's confgen blocks generate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parsers import csv_parser, date_parser, regexp_parser

# Apache combined log format (scl/apache/apache.conf analogue)
_APACHE = (
    r'^(?P<clientip>\S+) (?P<ident>\S+) (?P<auth>\S+) '
    r'\[(?P<apache_ts>[^\]]+)\] "(?P<verb>\S+) (?P<request>\S+)(?: (?P<httpversion>[^"]*))?" '
    r'(?P<response>\d{3}) (?P<bytes>\d+|-)'
    r'(?: "(?P<referrer>[^"]*)" "(?P<agent>[^"]*)")?'
)


def apache_accesslog_parser(
    df: DataFrame, source: str = "text", prefix: str = ".apache."
) -> DataFrame:
    """apache-accesslog-parser(): combined/common log → typed columns
    under `.apache.` names (reference SCL target naming)."""
    def bq(name: str):  # dotted SCL names need backtick quoting
        return F.col(f"`{name}`")

    out = regexp_parser(df, _APACHE, source=source, prefix=prefix, matched_col="apache_matched")
    out = date_parser(
        out, ["dd/MMM/yyyy:HH:mm:ss Z"], source=bq(f"{prefix}apache_ts"),
        target=f"{prefix}stamp",
    )
    return (
        out.withColumn(f"{prefix}response", bq(f"{prefix}response").cast("int"))
        .withColumn(
            f"{prefix}bytes",
            F.when(bq(f"{prefix}bytes") == "-", None).otherwise(
                bq(f"{prefix}bytes").cast("long")
            ),
        )
    )


# Cisco IOS-ish system message: "%FACILITY-SEVERITY-MNEMONIC: text"
_CISCO = (
    r"^(?:.*?)%(?P<cisco_facility>[A-Z0-9_]+)-(?P<cisco_severity>\d)-"
    r"(?P<cisco_mnemonic>[A-Z0-9_]+): (?P<cisco_message>.*)$"
)


def cisco_parser(df: DataFrame, source: str = "text", prefix: str = ".cisco.") -> DataFrame:
    """cisco-parser(): IOS %FAC-SEV-MNEMONIC header → columns + pri
    severity bits (reference scl/cisco)."""
    out = regexp_parser(df, _CISCO, source=source, prefix=prefix, matched_col="cisco_matched")
    return out.withColumn(
        f"{prefix}severity_num", F.col(f"`{prefix}cisco_severity`").cast("int")
    )


def postgresql_csvlog_parser(df: DataFrame, source: str = "text") -> DataFrame:
    """postgresql-csvlog shape: the first columns of PG's CSV log."""
    return csv_parser(
        df,
        [
            ("pg_ts", "string"),
            ("pg_user", "string"),
            ("pg_db", "string"),
            ("pg_pid", "int"),
            ("pg_conn", "string"),
            ("pg_session_id", "string"),
            ("pg_line", "string"),
            ("pg_cmd", "string"),
        ],
        source=source,
        prefix="",
    )


def mariadb_audit_parser(df: DataFrame, source: str = "text", prefix: str = ".mariadb.") -> DataFrame:
    """mariadb-audit-parser() (scl/mariadb/audit.conf): 9-column CSV with
    backslash escaping, '' quotes, greedy last column; then splits the
    first field into syslog_info + serverhost."""
    out = csv_parser(
        df,
        [
            (f"{prefix}serverhost_raw", "string"),
            (f"{prefix}username", "string"),
            (f"{prefix}host", "string"),
            (f"{prefix}connectionid", "string"),
            (f"{prefix}queryid", "string"),
            (f"{prefix}operation", "string"),
            (f"{prefix}database", "string"),
            (f"{prefix}object", "string"),
            (f"{prefix}retcode", "string"),
        ],
        source=source,
        quote="'",
        escape="\\",
        greedy=False,
    )
    raw = F.col(f"`{prefix}serverhost_raw`")
    return (
        out.withColumn(
            f"{prefix}syslog_info", F.regexp_extract(raw, r"^\s*(\S*?)(?: )?\S+$", 1)
        )
        .withColumn(f"{prefix}serverhost", F.regexp_extract(raw, r"(\S+)$", 1))
        .drop(f"{prefix}serverhost_raw")
    )


# PAN-OS per-type column layouts after the 8 common columns
# (scl/paloalto/panos.conf; SYSTEM and CONFIG shipped, others follow the
# same pattern)
_PANOS_SYSTEM = [
    "vsys", "eventid", "object", "future_use3", "future_use4", "module",
    "severity", "opaque", "seqno", "actionflags", "dg_hier_level_1",
    "dg_hier_level_2", "dg_hier_level_3", "dg_hier_level_4", "vsys_name",
    "device_name",
]
_PANOS_CONFIG = [
    "host", "vsys", "cmd", "admin", "client", "result", "path", "seqno",
    "actionflags", "dg_hier_level_1", "dg_hier_level_2", "dg_hier_level_3",
    "dg_hier_level_4", "vsys_name", "device_name",
]


def panos_parser(df: DataFrame, source: str = "text", prefix: str = ".panos.") -> DataFrame:
    """panos-parser() (scl/paloalto/panos.conf): common 8-column CSV head
    (greedy tail), then a per-``type`` second CSV pass over the tail —
    batch shape: parse both layouts as columns, keep the matching one
    (a CASE instead of the reference's if/elif channel)."""
    out = csv_parser(
        df,
        [(f"{prefix}{c}", "string") for c in
         ["future_use1", "receive_time", "serial", "type", "subtype",
          "future_use2", "time_generated"]] + [(f"{prefix}tmp", "string")],
        source=source,
        greedy=True,
    )
    tmp = F.col(f"`{prefix}tmp`")
    typ = F.col(f"`{prefix}type`")
    sys_parts = F.split(tmp, ",")
    for i, name in enumerate(_PANOS_SYSTEM):
        out = out.withColumn(
            f"{prefix}{name}",
            F.when(typ == "SYSTEM", F.element_at(sys_parts, i + 1)),
        )
    for i, name in enumerate(_PANOS_CONFIG):
        cname = f"{prefix}{name}"
        val = F.when(typ == "CONFIG", F.element_at(sys_parts, i + 1))
        if cname in out.columns:
            out = out.withColumn(cname, F.coalesce(F.col(f"`{cname}`"), val))
        else:
            out = out.withColumn(cname, val)
    return out.withColumn(
        f"{prefix}matched", typ.isin("SYSTEM", "CONFIG")
    )


def sdata_parser(df: DataFrame, source: str = "text", prefix: str = ".SDATA.") -> DataFrame:
    """RFC5424 STRUCTURED-DATA → map column: '[id k="v" ...][id2 ...]'
    becomes {'<prefix>id.k': 'v'} (lib/syslog-format.c SDATA naming)."""
    import re  # noqa: PLC0415

    elem_re = re.compile(r"\[([^\] ]+)((?: [\w.@-]+=\"(?:[^\"\\]|\\.)*\")*)\]")
    kv_re = re.compile(r"([\w.@-]+)=\"((?:[^\"\\]|\\.)*)\"")

    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def parse(s: pd.Series) -> pd.Series:
        def one(t):
            if not t or not t.startswith("["):
                return None
            out = {}
            for sd_id, body in elem_re.findall(t):
                for k, v in kv_re.findall(body):
                    out[f"{prefix}{sd_id}.{k}"] = v.replace('\\"', '"').replace("\\\\", "\\")
            return out or None

        return s.map(one)

    src = F.col(source) if isinstance(source, str) else source
    out = df.withColumn("sdata", parse(src))
    return out.withColumn("sdata_matched", F.col("sdata").isNotNull())


def app_parser(df: DataFrame, source: str = "text", program_col: str = "program") -> DataFrame:
    """app-parser() (modules/appmodel/app-parser-generator.c): try the
    registered application presets and tag the first whose parser
    matches — batch shape: all presets parse as columns (cheap, pruned
    when unused), ``app`` = first matched."""
    out = apache_accesslog_parser(df, source=source)
    out = cisco_parser(out, source=source)
    out = sdata_parser(out, source=source)
    return out.withColumn(
        "app",
        F.when(F.col("apache_matched"), "apache")
        .when(F.col("cisco_matched"), "cisco")
        .when(F.col("sdata_matched"), "rfc5424-sd"),
    )


def windows_eventlog_parser(df: DataFrame, source: str = "text", prefix: str = ".windows.") -> DataFrame:
    """windows-eventlog XML variant (modules/xml/windows-eventlog-xml-
    parser.c): like xml-parser, but <EventData><Data Name='K'>v</Data>
    entries key by their Name attribute instead of position."""
    @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def parse(s: pd.Series) -> pd.Series:
        import xml.etree.ElementTree as ET  # noqa: PLC0415

        def strip_ns(tag):
            return tag.split("}", 1)[-1]

        def one(txt):
            if not txt:
                return None
            try:
                root = ET.fromstring(txt)
            except ET.ParseError:
                return None
            out = {}

            def walk(node, path):
                tag = strip_ns(node.tag)
                p = f"{path}.{tag}"
                if tag == "Data" and "Name" in node.attrib:
                    out[f"{path}.Data.{node.attrib['Name']}"] = node.text or ""
                    return
                for ak, av in node.attrib.items():
                    out[f"{p}._{ak}"] = av
                text = (node.text or "").strip()
                if text:
                    out[p] = out.get(p, "") + text
                for child in node:
                    walk(child, p)

            walk(root, prefix.rstrip("."))
            return out

        return s.map(one)

    src = F.col(source) if isinstance(source, str) else source
    out = df.withColumn("winlog", parse(src))
    return out.withColumn("winlog_matched", F.col("winlog").isNotNull())
