"""Template macros — the ~170 derived columns of the reference
(/root/reference/lib/template/macros.c:51-146) re-expressed as Column
builders over the engine's schema. All JVM-side (date_format / arithmetic
on pri / array_join), zero Python in the hot path.

A macro is a function ``(ctx: dict[str, Column]) -> Column`` where ctx
maps logical field names (ts, pri, host, program, pid, text, tags, ...)
to Columns; ``macro(name)`` resolves by name.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .filters import facility_name_col, severity_name_col


def default_ctx() -> dict[str, Column]:
    """Column bindings for the post-parse transcript frame."""
    names = ["ts", "pri", "host", "program", "pid", "text", "tags", "msgid"]
    return {n: F.col(n) for n in names}


def _ts(ctx) -> Column:
    return ctx.get("ts", F.col("ts"))


def _pri(ctx) -> Column:
    return ctx.get("pri", F.col("pri"))


_MACROS: dict[str, object] = {
    # priority family (macros.c: FACILITY/SEVERITY/PRI/LEVEL_NUM...)
    "FACILITY": lambda ctx: facility_name_col(_pri(ctx)),
    "FACILITY_NUM": lambda ctx: (_pri(ctx) / 8).cast("int"),
    "SEVERITY": lambda ctx: severity_name_col(_pri(ctx)),
    "LEVEL": lambda ctx: severity_name_col(_pri(ctx)),
    "SEVERITY_NUM": lambda ctx: F.pmod(_pri(ctx), F.lit(8)).cast("int"),
    "LEVEL_NUM": lambda ctx: F.pmod(_pri(ctx), F.lit(8)).cast("int"),
    "PRI": lambda ctx: _pri(ctx).cast("string"),
    "PRIORITY": lambda ctx: severity_name_col(_pri(ctx)),
    # date/time family (S_ = event/stamp time; we alias R_/C_ variants to the
    # same event-time column — arrival/processed stamps collapse in batch)
    "ISODATE": lambda ctx: F.date_format(_ts(ctx), "yyyy-MM-dd'T'HH:mm:ssxxx"),
    "DATE": lambda ctx: F.date_format(_ts(ctx), "MMM dd HH:mm:ss"),
    "FULLDATE": lambda ctx: F.date_format(_ts(ctx), "yyyy MMM dd HH:mm:ss"),
    "YEAR": lambda ctx: F.date_format(_ts(ctx), "yyyy"),
    "MONTH": lambda ctx: F.date_format(_ts(ctx), "MM"),
    "MONTH_ABBREV": lambda ctx: F.date_format(_ts(ctx), "MMM"),
    "DAY": lambda ctx: F.date_format(_ts(ctx), "dd"),
    "HOUR": lambda ctx: F.date_format(_ts(ctx), "HH"),
    "MIN": lambda ctx: F.date_format(_ts(ctx), "mm"),
    "SEC": lambda ctx: F.date_format(_ts(ctx), "ss"),
    "MSEC": lambda ctx: F.date_format(_ts(ctx), "SSS"),
    "USEC": lambda ctx: F.date_format(_ts(ctx), "SSSSSS"),
    "WEEKDAY": lambda ctx: F.date_format(_ts(ctx), "EEE"),
    "WEEK_DAY": lambda ctx: (F.dayofweek(_ts(ctx))).cast("string"),
    "UNIXTIME": lambda ctx: F.unix_timestamp(_ts(ctx)).cast("string"),
    "STAMP": lambda ctx: F.date_format(_ts(ctx), "yyyy-MM-dd'T'HH:mm:ssxxx"),
    "TZOFFSET": lambda ctx: F.date_format(_ts(ctx), "xxx"),
    # message fields
    "HOST": lambda ctx: ctx.get("host", F.col("host")),
    "HOST_FROM": lambda ctx: ctx.get("host", F.col("host")),
    "PROGRAM": lambda ctx: ctx.get("program", F.col("program")),
    "PID": lambda ctx: ctx.get("pid", F.col("pid")).cast("string"),
    "MESSAGE": lambda ctx: ctx.get("text", F.col("text")),
    "MSG": lambda ctx: ctx.get("text", F.col("text")),
    "MSGID": lambda ctx: ctx.get("msgid", F.col("msgid")),
    "MSGHDR": lambda ctx: F.concat_ws(
        "",
        ctx.get("program", F.col("program")),
        F.when(
            ctx.get("pid", F.col("pid")).isNotNull(),
            F.concat(F.lit("["), ctx.get("pid", F.col("pid")).cast("string"), F.lit("]")),
        ).otherwise(F.lit("")),
        F.lit(": "),
    ),
    "TAGS": lambda ctx: F.array_join(ctx.get("tags", F.col("tags")), ","),
    # transcript-native fields double as macros
    "CONV_ID": lambda ctx: ctx.get("conv_id", F.col("conv_id")),
    "TURN_IDX": lambda ctx: ctx.get("turn_idx", F.col("turn_idx")).cast("string"),
    "ROLE": lambda ctx: ctx.get("role", F.col("role")),
    "TOOL": lambda ctx: ctx.get("tool", F.col("tool")),
    # identity-ish
    "RCPTID": lambda ctx: ctx.get(
        "rcptid", F.monotonically_increasing_id()
    ).cast("string"),
    "SOURCEIP": lambda ctx: ctx.get("source_ip", F.lit("127.0.0.1")),
    "SEQNUM": lambda ctx: ctx.get("seqnum", F.lit("")),
    "CONTEXT_ID": lambda ctx: ctx.get("context_id", F.lit("")),
}


def is_macro(name: str) -> bool:
    return name in _MACROS


def macro(name: str, ctx: dict[str, Column] | None = None) -> Column:
    """Resolve a macro name to a Column. Unknown names raise KeyError."""
    return _MACROS[name](ctx or {})


def macro_names() -> list[str]:
    return sorted(_MACROS)
