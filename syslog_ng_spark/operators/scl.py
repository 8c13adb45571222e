"""SCL presets: config-library parsers composed from base operators,
mirroring the reference's scl/ blocks (apache-accesslog-parser,
cisco-parser, postgresql-csvlog shapes). Each is just a composition —
the same thing the reference's confgen blocks generate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
