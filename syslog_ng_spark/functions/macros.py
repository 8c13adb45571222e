"""Template macros — the ~170 derived columns of the reference
(/root/reference/lib/template/macros.c:51-236) re-expressed as Column
builders over the engine's schema. All JVM-side (date_format / arithmetic
on pri / array_join), zero Python in the hot path.

A macro is a function ``(ctx: dict[str, Column]) -> Column`` where ctx
maps logical field names (ts, pri, host, program, pid, text, tags, ...)
to Columns; ``macro(name)`` resolves by name.

Timestamp families: the reference keeps three stamps per message —
S_* (sent/stamp), R_* (received) and C_* (current wall clock), plus P_*
(processed) — and the bare names alias S_*. A batch engine reading
parquet has ONE event-time column, so all four prefixes resolve to it;
R_/P_ ctx bindings (``recvd_ts``, ``proc_ts``) override when a pipeline
actually carries separate stamps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .filters import facility_name_col, severity_name_col


def default_ctx() -> dict[str, Column]:
    """Column bindings for the post-parse transcript frame."""
    names = ["ts", "pri", "host", "program", "pid", "text", "tags", "msgid"]
    return {n: F.col(n) for n in names}


def _ts_for(prefix: str):
    """ts column for a macro family: R_/P_ prefer their own ctx binding,
    everything falls back to the single event-time column."""
    binding = {"R_": "recvd_ts", "C_": "now_ts", "P_": "proc_ts"}.get(prefix)

    def get(ctx) -> Column:
        if binding and binding in ctx:
            return ctx[binding]
        return ctx.get("ts", F.col("ts"))

    return get


def _pri(ctx) -> Column:
    return ctx.get("pri", F.col("pri"))


def _bsd_date(ts: Column) -> Column:
    # TS_FMT_BSD: space-padded day ("Jan  5 04:00:00")
    return F.concat(
        F.date_format(ts, "MMM"),
        F.lit(" "),
        F.lpad(F.date_format(ts, "d"), 2, " "),
        F.lit(" "),
        F.date_format(ts, "HH:mm:ss"),
    )


def _week(ts: Column) -> Column:
    # macros.c M_WEEK: (yday - (wday-1+7)%7 + 7) / 7, Sunday-based wday,
    # 0-based yday, zero-padded to 2
    yday0 = F.dayofyear(ts) - 1
    wday = F.dayofweek(ts) - 1  # 0 = Sunday
    wk = F.floor((yday0 - F.pmod(wday - 1 + 7, F.lit(7)) + 7) / 7)
    return F.lpad(wk.cast("string"), 2, "0")


def _month_week(ts: Column) -> Column:
    # macros.c M_MONTH_WEEK: mday/7 + ((wday>0) && (mday%7 >= wday))
    mday = F.dayofmonth(ts)
    wday = F.dayofweek(ts) - 1
    extra = ((wday > 0) & (F.pmod(mday, F.lit(7)) >= wday)).cast("int")
    return (F.floor(mday / 7) + extra).cast("string")


# time-family macros: suffix → builder(ts) -> Column (27 per family)
_TIME_FAMILY: dict[str, object] = {
    "DATE": _bsd_date,
    "FULLDATE": lambda ts: F.date_format(ts, "yyyy MMM dd HH:mm:ss"),
    "ISODATE": lambda ts: F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssxxx"),
    "STAMP": lambda ts: F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssxxx"),
    "YEAR": lambda ts: F.date_format(ts, "yyyy"),
    "YEAR_DAY": lambda ts: F.date_format(ts, "DDD"),
    "MONTH": lambda ts: F.date_format(ts, "MM"),
    "MONTH_WEEK": _month_week,
    "MONTH_ABBREV": lambda ts: F.date_format(ts, "MMM"),
    "MONTH_NAME": lambda ts: F.date_format(ts, "MMMM"),
    "DAY": lambda ts: F.date_format(ts, "dd"),
    "HOUR": lambda ts: F.date_format(ts, "HH"),
    "HOUR12": lambda ts: F.date_format(ts, "hh"),
    "MIN": lambda ts: F.date_format(ts, "mm"),
    "SEC": lambda ts: F.date_format(ts, "ss"),
    "MSEC": lambda ts: F.date_format(ts, "SSS"),
    "USEC": lambda ts: F.date_format(ts, "SSSSSS"),
    "AMPM": lambda ts: F.date_format(ts, "a"),
    "WEEKDAY": lambda ts: F.date_format(ts, "EEE"),  # deprecated alias
    "WEEK_DAY": lambda ts: F.dayofweek(ts).cast("string"),  # Sunday = 1
    "WEEK_DAY_ABBREV": lambda ts: F.date_format(ts, "EEE"),
    "WEEK_DAY_NAME": lambda ts: F.date_format(ts, "EEEE"),
    "WEEK": _week,
    "ISOWEEK": lambda ts: F.lpad(F.weekofyear(ts).cast("string"), 2, "0"),
    "TZOFFSET": lambda ts: F.date_format(ts, "xxx"),
    "TZ": lambda ts: F.date_format(ts, "xxx"),
    "UNIXTIME": lambda ts: F.unix_timestamp(ts).cast("string"),
}


def _field(name: str, cast: str | None = None):
    def get(ctx) -> Column:
        c = ctx.get(name, F.col(name))
        return c.cast(cast) if cast else c

    return get


_MACROS: dict[str, object] = {
    # priority family (macros.c M_FACILITY..M_BSDTAG)
    "FACILITY": lambda ctx: facility_name_col(_pri(ctx)),
    "FACILITY_NUM": lambda ctx: (_pri(ctx) / 8).cast("int"),
    "SEVERITY": lambda ctx: severity_name_col(_pri(ctx)),
    "LEVEL": lambda ctx: severity_name_col(_pri(ctx)),
    "SEVERITY_NUM": lambda ctx: F.pmod(_pri(ctx), F.lit(8)).cast("int"),
    "LEVEL_NUM": lambda ctx: F.pmod(_pri(ctx), F.lit(8)).cast("int"),
    "PRI": lambda ctx: _pri(ctx).cast("string"),
    "PRIORITY": lambda ctx: severity_name_col(_pri(ctx)),
    # M_TAG: pri as 2-digit zero-padded lowercase hex
    "TAG": lambda ctx: F.lower(F.lpad(F.hex(_pri(ctx)), 2, "0")),
    # M_BSDTAG: severity digit + facility as a letter from 'A'
    "BSDTAG": lambda ctx: F.concat(
        F.pmod(_pri(ctx), F.lit(8)).cast("string"),
        F.char(((_pri(ctx) / 8).cast("int") + 65)),
    ),
    "TAGS": lambda ctx: F.array_join(ctx.get("tags", F.col("tags")), ","),
    # message fields
    "HOST": _field("host"),
    "HOST_FROM": _field("host"),
    "PROGRAM": _field("program"),
    "PID": _field("pid", "string"),
    "MESSAGE": _field("text"),
    "MSG": _field("text"),
    "MSGID": _field("msgid"),
    "SDATA": lambda ctx: ctx.get("sdata", F.lit("")),
    "MSGHDR": lambda ctx: F.concat_ws(
        "",
        ctx.get("program", F.col("program")),
        F.when(
            ctx.get("pid", F.col("pid")).isNotNull(),
            F.concat(F.lit("["), ctx.get("pid", F.col("pid")).cast("string"), F.lit("]")),
        ).otherwise(F.lit("")),
        F.lit(": "),
    ),
    # transport/peer metadata — batch sources have no socket, ctx may bind
    "SOURCEIP": lambda ctx: ctx.get("source_ip", F.lit("127.0.0.1")),
    "SOURCEPORT": lambda ctx: ctx.get("source_port", F.lit("0")),
    "DESTIP": lambda ctx: ctx.get("dest_ip", F.lit("")),
    "DESTPORT": lambda ctx: ctx.get("dest_port", F.lit("")),
    "PEERIP": lambda ctx: ctx.get("peer_ip", ctx.get("source_ip", F.lit("127.0.0.1"))),
    "PEERPORT": lambda ctx: ctx.get("peer_port", ctx.get("source_port", F.lit("0"))),
    "IP_PROTO": lambda ctx: ctx.get("ip_proto", F.lit(4)).cast("int"),
    "PROTO": lambda ctx: ctx.get("proto", F.lit(0)).cast("int"),
    "RAWMSG_SIZE": lambda ctx: F.length(ctx.get("raw", ctx.get("text", F.col("text")))),
    # identity / run metadata
    "SEQNUM": lambda ctx: ctx.get("seqnum", F.lit("")),
    "CONTEXT_ID": lambda ctx: ctx.get("context_id", F.lit("")),
    "_": lambda ctx: ctx.get("context_id", F.lit("")),
    "RCPTID": lambda ctx: ctx.get("rcptid", F.monotonically_increasing_id()).cast("string"),
    "RUNID": lambda ctx: ctx.get("runid", F.lit("")),
    "HOSTID": lambda ctx: ctx.get(
        "hostid", F.lpad(F.lower(F.hex(F.crc32(F.col("host").cast("binary")))), 8, "0")
    ),
    # M_UNIQID: <hostid>@<16-hex rcptid>
    "UNIQID": lambda ctx: F.concat(
        _MACROS["HOSTID"](ctx),
        F.lit("@"),
        F.lpad(
            F.lower(F.hex(ctx.get("rcptid", F.monotonically_increasing_id()))), 16, "0"
        ),
    ),
    "LOGHOST": lambda ctx: ctx.get("loghost", F.lit("spark-driver")),
    "SYSUPTIME": lambda ctx: ctx.get("sysuptime", F.lit("0")),
    # transcript-native fields double as macros
    "CONV_ID": _field("conv_id"),
    "TURN_IDX": _field("turn_idx", "string"),
    "ROLE": _field("role"),
    "TOOL": _field("tool"),
}

# expand the 27-macro time family across the bare + R_/S_/C_/P_ prefixes
for _prefix in ("", "R_", "S_", "C_", "P_"):
    _get_ts = _ts_for(_prefix)
    for _suffix, _builder in _TIME_FAMILY.items():
        _MACROS[f"{_prefix}{_suffix}"] = (
            lambda ctx, _b=_builder, _g=_get_ts: _b(_g(ctx))
        )


def is_macro(name: str) -> bool:
    return name in _MACROS


# default-ctx column requirements per macro family — lets value-pairs
# scopes ("everything", "all-macros") include exactly the macros a
# frame can evaluate instead of failing analysis on a missing column
_COL_REQ = {
    "FACILITY": {"pri"}, "FACILITY_NUM": {"pri"}, "SEVERITY": {"pri"},
    "SEVERITY_NUM": {"pri"}, "LEVEL": {"pri"}, "LEVEL_NUM": {"pri"},
    "PRI": {"pri"}, "PRIORITY": {"pri"}, "TAG": {"pri"}, "BSDTAG": {"pri"},
    "TAGS": {"tags"},
    "HOST": {"host"}, "HOST_FROM": {"host"}, "HOSTID": {"host"},
    "UNIQID": {"host"},
    "PROGRAM": {"program"}, "PID": {"pid"}, "MSGHDR": {"program", "pid"},
    "MESSAGE": {"text"}, "MSG": {"text"}, "RAWMSG_SIZE": {"text"},
    "MSGID": {"msgid"},
    "CONV_ID": {"conv_id"}, "TURN_IDX": {"turn_idx"},
    "ROLE": {"role"}, "TOOL": {"tool"},
}


def macro_requires(name: str) -> set[str]:
    """Column names the macro needs under the DEFAULT ctx (macros with a
    ctx fallback literal — SOURCEIP, SEQNUM, … — need none; every time
    macro resolves against the event-time column)."""
    base = name
    for p in ("R_", "S_", "C_", "P_"):
        if name.startswith(p):
            base = name[len(p):]
            break
    if base in _TIME_FAMILY:
        return {"ts"}
    return _COL_REQ.get(name, set())


def macro(name: str, ctx: dict[str, Column] | None = None) -> Column:
    """Resolve a macro name to a Column. Unknown names raise KeyError."""
    return _MACROS[name](ctx or {})


def macro_names() -> list[str]:
    return sorted(_MACROS)
