"""Enrichment: lookup joins (SURVEY.md §2.5 geoip2 / add-contextual-data).

Both reference operators are per-message lookups against an in-memory
database. At 100 TB the idiomatic Spark shape is a **broadcast hash join**
— the lookup table ships once per executor, the probe stays narrow
(no shuffle of the big side). CIDR/range lookups use prefix-bucketed
equi-joins so they broadcast too, instead of a nested-loop range join.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.filters import ip_to_long


def add_contextual_data(
    df: DataFrame,
    context: DataFrame,
    selector: Column | str,
    default_selector: str | None = None,
    prefix: str = "",
    target: str = "ctx",
) -> DataFrame:
    """add-contextual-data() — modules/add-contextual-data (db
    context-info-db.c:205-235): the context table has rows
    (selector, name, value); every input row's selector template picks the
    matching records, whose name/value pairs land on the row.

    Rebuild: pre-aggregate the context to (selector, map<name,value>) —
    tiny —, broadcast, LEFT join on the selector expression, and
    ``default-selector`` becomes a coalesce with the default selector's
    map (same fallback semantics, zero extra join).
    """
    sel = F.col(selector) if isinstance(selector, str) else selector
    packed = (
        context.groupBy("selector")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("name"), F.col("value")))
            ).alias("_ctx_map")
        )
    )
    if prefix:
        packed = packed.withColumn(
            "_ctx_map",
            F.transform_keys(F.col("_ctx_map"), lambda k, _v: F.concat(F.lit(prefix), k)),
        )
    joined = df.withColumn("_sel", sel).join(
        F.broadcast(packed), F.col("_sel") == packed["selector"], "left"
    ).drop("selector")
    if default_selector is not None:
        default_map = (
            packed.filter(F.col("selector") == default_selector)
            .select("_ctx_map")
            .collect()
        )
        dmap = default_map[0][0] if default_map else {}
        dcol = (
            F.create_map(*[x for k, v in dmap.items() for x in (F.lit(k), F.lit(v))])
            if dmap
            else F.create_map().cast("map<string,string>")
        )
        joined = joined.withColumn("_ctx_map", F.coalesce(F.col("_ctx_map"), dcol))
    return joined.withColumnRenamed("_ctx_map", target).drop("_sel")


def context_info_db_from_csv(
    spark,
    path: str | None = None,
    lines: list[str] | None = None,
    name_prefix: str | None = None,
    ignore_case: bool = False,
):
    """context-info-db CSV import (modules/add-contextual-data/
    context-info-db.c context_info_db_import + contextual-data-record-
    scanner.c): (selector, name, value) triplets, blank lines skipped,
    extra columns rejected, ``name_prefix`` prepended to names. Returns
    ``(context_df, ordered_selectors)`` — the selector list in FIRST-
    APPEARANCE order (context_info_db_enable_ordering), ready to feed
    glob_selector(). Context DBs are broadcast-side small: parsing runs
    on the driver, deterministically."""
    import csv as _csv  # noqa: PLC0415
    import io as _io  # noqa: PLC0415

    if lines is None:
        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
    rows = []
    ordered: list[str] = []
    seen: set[str] = set()
    for lineno, line in enumerate(lines, 1):
        if not line:
            continue
        parsed = next(_csv.reader(_io.StringIO(line)))
        if len(parsed) != 3:
            raise ValueError(
                f"error parsing CSV line {lineno}: expecting "
                f"(selector, name, value) triplets, got {len(parsed)} columns"
            )
        selector, name, value = parsed
        if ignore_case:
            selector = selector.lower()
        if selector not in seen:
            seen.add(selector)
            ordered.append(selector)
        rows.append((selector, (name_prefix or "") + name, value))
    df = spark.createDataFrame(
        rows, "selector string, name string, value string"
    )
    return df, ordered


def glob_selector(selector: Column | str, globs: list[str]) -> Column:
    """add-contextual-data glob selector
    (modules/add-contextual-data/add-contextual-data-glob-selector.c):
    render the selector template/column and return the FIRST glob from
    the context database's selector set that matches it — the glob
    string itself is the selector value (so context rows keyed
    'local*' match hosts 'localhost', 'localdomain', ...); NULL when
    nothing matches. Compose with add_contextual_data(df, ctx,
    selector=glob_selector("host", ctx_globs))."""
    import fnmatch  # noqa: PLC0415

    col = F.col(selector) if isinstance(selector, str) else selector
    out = None
    for g in globs:
        # fnmatch.translate yields '(?s:...)\Z' — end-anchored only, and
        # Spark rlike is a FIND (substring search), so without '\A' glob
        # 'local*' would match 'mylocalhost'. The reference matches the
        # full string (g_pattern_match) — anchor both ends.
        cond = col.rlike("\\A" + fnmatch.translate(g))
        out = F.when(cond, F.lit(g)) if out is None else out.when(cond, F.lit(g))
    if out is None:
        return F.lit(None).cast("string")
    return out.otherwise(F.lit(None).cast("string"))


def filter_selector(ordered_filters: list[tuple[str, "Column | object"]]) -> Column:
    """add-contextual-data filter selector
    (add-contextual-data-filter-selector.c): the selector value is the
    NAME of the first filter (in ordered-filters order) whose
    expression matches the row; NULL when none do. Accepts (name,
    Column) or (name, FilterExpr) pairs."""
    out = None
    for name, cond in ordered_filters:
        c = cond.to_column() if hasattr(cond, "to_column") else cond
        out = F.when(c, F.lit(name)) if out is None else out.when(c, F.lit(name))
    if out is None:
        return F.lit(None).cast("string")
    return out.otherwise(F.lit(None).cast("string"))


def ctx_get(target: str, key: str) -> Column:
    return F.element_at(F.col(target), key)


# ---------------------------------------------------------------------------
# GeoIP-style CIDR range lookup (modules/geoip2/geoip-parser.c analogue)
# ---------------------------------------------------------------------------


def cidr_table(
    spark: SparkSession, records: list[tuple[str, dict[str, str]]]
) -> DataFrame:
    """Build a lookup DataFrame from (cidr, attributes) records.

    Expanded to /16-aligned buckets so the probe side can equi-join on its
    own /16 prefix — broadcastable and hash-joinable, no range-join
    nested loop. A /8 network becomes 256 bucket rows: the classic
    prefix-expansion trade (tiny dimension blowup for an equi-join).
    """
    rows = []
    for cidr, attrs in records:
        net = ipaddress.ip_network(cidr, strict=False)
        lo, hi = int(net.network_address), int(net.broadcast_address)
        for b16 in range(lo >> 16, (hi >> 16) + 1):
            rows.append((b16, lo, hi, attrs))
    flat = spark.createDataFrame(
        rows, "bucket16 long, ip_lo long, ip_hi long, geo map<string,string>"
    )
    # Pack each bucket's ranges into ONE array row, most-specific
    # (smallest range) first — the probe side then resolves longest-prefix
    # with pure array functions, so the whole lookup is a broadcast
    # equi-join + projection: no shuffle, no per-row ambiguity.
    return flat.groupBy("bucket16").agg(
        F.array_sort(
            F.collect_list(F.struct("ip_lo", "ip_hi", "geo")),
            lambda a, b: F.when(
                (a["ip_hi"] - a["ip_lo"]) < (b["ip_hi"] - b["ip_lo"]), -1
            )
            .when((a["ip_hi"] - a["ip_lo"]) > (b["ip_hi"] - b["ip_lo"]), 1)
            .otherwise(0),
        ).alias("ranges")
    )


def geoip(
    df: DataFrame,
    lookup: DataFrame,
    ip_col: str | Column = "src_ip",
    target: str = "geo",
) -> DataFrame:
    """Join each row's IPv4 string against the CIDR lookup.

    Probe: ip → int64 (pure Column math), bucket on /16, broadcast
    equi-join on the bucket (lookup built by ``cidr_table``), then the
    most-specific containing range is picked with array functions —
    single narrow stage over the fact table.
    """
    ip = F.col(ip_col) if isinstance(ip_col, str) else ip_col
    probe = df.withColumn("_ipl", ip_to_long(ip)).withColumn(
        "_b16", (F.col("_ipl") / 65536).cast("long")
    )
    joined = probe.join(
        F.broadcast(lookup), F.col("_b16") == lookup["bucket16"], "left"
    )
    ipl = F.col("_ipl")
    hit = F.filter(
        F.col("ranges"), lambda r: (r["ip_lo"] <= ipl) & (ipl <= r["ip_hi"])
    )
    best = F.when(F.size(hit) > 0, F.element_at(hit, 1)["geo"])
    return joined.withColumn(target, best).drop("bucket16", "ranges", "_ipl", "_b16")


def in_list_semi_join(df: DataFrame, values: DataFrame, on: str) -> DataFrame:
    """in-list() at scale: broadcast LEFT SEMI join instead of isin()
    when the membership set is too large for a literal list
    (lib/filter/filter-in-list.c analogue)."""
    return df.join(F.broadcast(values), on=on, how="left_semi")


def geoip_column(ip_col: Column | str, records: list[tuple[str, str]]) -> Column:
    """Join-free geoip for SMALL CIDR tables (≤ ~100 entries): compiles to
    a constant-folded when-chain over int64 range tests — usable inside
    templates and filters where a join is unavailable ($(geoip2 ...)
    template-function analogue). Most-specific CIDR wins (sorted by
    prefix length descending at plan time)."""
    ip = F.col(ip_col) if isinstance(ip_col, str) else ip_col
    ipl = ip_to_long(ip)
    nets = sorted(
        (
            (ipaddress.ip_network(cidr, strict=False), value)
            for cidr, value in records
        ),
        key=lambda nv: -nv[0].prefixlen,
    )
    expr = None
    for net, value in nets:
        cond = ipl.between(int(net.network_address), int(net.broadcast_address))
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(F.lit(None)) if expr is not None else F.lit(None)


def cidr6_table(
    spark: SparkSession, records: list[tuple[str, dict[str, str]]]
) -> DataFrame:
    """IPv6 lookup table: ranges as (hi, lo) signed-long pairs, bucketed
    by the top 16 bits so the probe equi-joins (same prefix-expansion
    trade as the IPv4 table; IPv6 allocations are top-heavy so /16-of-hi
    buckets stay tiny)."""
    rows = []
    for cidr, attrs in records:
        net = ipaddress.ip_network(cidr, strict=False)
        lo_n, hi_n = int(net.network_address), int(net.broadcast_address)

        def split(n: int) -> tuple[int, int]:
            h, l = n >> 64, n & ((1 << 64) - 1)
            tos = lambda x: x - (1 << 64) if x >= (1 << 63) else x  # noqa: E731
            return tos(h), tos(l)

        for b in range(lo_n >> 112, (hi_n >> 112) + 1):
            rows.append((b, *split(lo_n), *split(hi_n), net.prefixlen, attrs))
    flat = spark.createDataFrame(
        rows,
        "bucket long, lo_hi long, lo_lo long, hi_hi long, hi_lo long, "
        "plen int, geo map<string,string>",
    )
    return flat.groupBy("bucket").agg(
        F.array_sort(
            F.collect_list(F.struct("lo_hi", "lo_lo", "hi_hi", "hi_lo", "plen", "geo")),
            # longest-prefix-wins: most-specific (largest prefixlen) first.
            # Sorting on span instead breaks for prefixes ≥ /64, where the
            # hi-64-bit span is 0 for every range and ties were arbitrary.
            lambda a, b: F.when(a["plen"] > b["plen"], -1)
            .when(a["plen"] < b["plen"], 1)
            .otherwise(0),
        ).alias("ranges")
    )


def geoip6(
    df: DataFrame,
    lookup: DataFrame,
    ip_col: str | Column = "src_ip",
    target: str = "geo",
) -> DataFrame:
    """IPv6 CIDR lookup: one Arrow UDF decomposes the address to (hi, lo)
    longs, then a broadcast equi-join on the top-16-bit bucket + array
    range resolution — the geoip() shape on 128-bit addresses."""
    from ..functions.filters import _ipv6_to_longs  # noqa: PLC0415

    ip = F.col(ip_col) if isinstance(ip_col, str) else ip_col
    MIN = -(1 << 63)
    pair = _ipv6_to_longs(ip)
    probe = (
        df.withColumn("_h", pair["hi"])
        .withColumn("_l", pair["lo"])
        # logical shift: bucket = top 16 bits of the raw 128-bit address
        .withColumn("_bucket", F.shiftrightunsigned(F.col("_h"), 48))
    )
    joined = probe.join(F.broadcast(lookup), F.col("_bucket") == lookup["bucket"], "left")
    uh = F.col("_h").bitwiseXOR(MIN)
    ul = F.col("_l").bitwiseXOR(MIN)

    def ge(hi_c, lo_c):
        return (uh > hi_c.bitwiseXOR(MIN)) | (
            (uh == hi_c.bitwiseXOR(MIN)) & (ul >= lo_c.bitwiseXOR(MIN))
        )

    def le(hi_c, lo_c):
        return (uh < hi_c.bitwiseXOR(MIN)) | (
            (uh == hi_c.bitwiseXOR(MIN)) & (ul <= lo_c.bitwiseXOR(MIN))
        )

    hit = F.filter(
        F.col("ranges"),
        lambda r: ge(r["lo_hi"], r["lo_lo"]) & le(r["hi_hi"], r["hi_lo"]),
    )
    best = F.when(F.col("_h").isNotNull() & (F.size(hit) > 0), F.element_at(hit, 1)["geo"])
    return joined.withColumn(target, best).drop(
        "bucket", "ranges", "_h", "_l", "_bucket"
    )


def dns_resolve_ip(
    df: DataFrame,
    hosts: DataFrame,
    ip_col: str = "src_ip",
    target: str = "hostname",
) -> DataFrame:
    """$(dns-resolve-ip) analogue (modules/basicfuncs tf_dns_resolve_ip):
    the reference resolves via /etc/hosts + DNS with a persist-cache; a
    batch engine must not block executors on network lookups, so the
    resolution source is a HOSTS TABLE (ip → hostname; load it from
    /etc/hosts, a DNS export, or a PTR-zone dump) broadcast-joined onto
    the stream. Unresolved IPs fall back to the literal address, like
    the reference's use-dns(no) path.

    The hosts side is deduplicated by ip (first hostname per ip, ordered
    by hostname for determinism) — /etc/hosts routinely lists one IP on
    several lines, and a duplicate-IP left join would FAN OUT event rows,
    corrupting every downstream count. The reference's dns-cache likewise
    holds exactly one name per address (lib/dnscache.c)."""
    h = (
        hosts.select(F.col("ip").alias("_dns_ip"), F.col("hostname").alias("_dns_hn"))
        .groupBy("_dns_ip")
        .agg(F.min("_dns_hn").alias("_dns_hn"))
    )
    return (
        df.join(F.broadcast(h), F.col(ip_col) == F.col("_dns_ip"), "left")
        .withColumn(target, F.coalesce(F.col("_dns_hn"), F.col(ip_col)))
        .drop("_dns_ip", "_dns_hn")
    )


def load_hosts_file(spark, path: str = "/etc/hosts") -> DataFrame:
    """Parse an /etc/hosts-format file into the (ip, hostname) table
    ``dns_resolve_ip`` consumes (first hostname per line wins)."""
    lines = spark.read.text(path)
    parts = F.split(F.regexp_replace(F.trim(F.col("value")), r"#.*$", ""), r"\s+")
    return (
        lines.select(
            F.element_at(parts, 1).alias("ip"),
            F.element_at(parts, 2).alias("hostname"),
        )
        .filter(F.col("ip").isNotNull() & (F.col("ip") != "") & F.col("hostname").isNotNull())
    )


# ---------------------------------------------------------------------------
# $(getent) (modules/getent/tfgetent.c) — NSS lookups as lookup tables
# ---------------------------------------------------------------------------

# entity -> list of entry dicts. The reference calls getpwnam_r & co per
# message; a batch engine must not make NSS calls per row, so the tables
# are registered once (from the OS files or any export) and compiled
# into the plan as a literal map — the driver-side dict IS the broadcast.
_GETENT_TABLES: dict = {}

# (numeric-key default member, string-key default member) per entity —
# getent-passwd.c/getent-group.c: "$(getent passwd 0)" yields the name,
# "$(getent passwd root)" yields the uid
_GETENT_DEFAULTS = {"passwd": ("name", "uid"), "group": ("name", "gid")}


def register_getent_table(entity: str, entries: list[dict]) -> None:
    """Register lookup entries for ``$(getent <entity> ...)``.

    ``passwd`` entries: name/uid/gid/gecos/dir/shell; ``group``:
    name/gid/members (list); ``services``/``protocols``: name/number
    (+aliases list). Keys may be looked up by name or number, exactly
    like the NSS by-name/by-id call pairs."""
    _GETENT_TABLES[entity] = entries


def load_getent_from_os(etc_dir: str = "/etc") -> None:
    """Populate the getent tables from the standard /etc files (the same
    data source NSS 'files' would consult). Missing files are skipped."""
    import os

    def lines(name):
        p = os.path.join(etc_dir, name)
        if not os.path.exists(p):
            return []
        with open(p, encoding="utf-8", errors="replace") as fh:
            return [
                ln.strip() for ln in fh
                if ln.strip() and not ln.lstrip().startswith("#")
            ]

    pw = []
    for ln in lines("passwd"):
        f = ln.split(":")
        if len(f) >= 7:
            pw.append({"name": f[0], "uid": f[2], "gid": f[3],
                       "gecos": f[4], "dir": f[5], "shell": f[6]})
    if pw:
        register_getent_table("passwd", pw)
    gr = []
    for ln in lines("group"):
        f = ln.split(":")
        if len(f) >= 4:
            gr.append({"name": f[0], "gid": f[2],
                       "members": [m for m in f[3].split(",") if m]})
    if gr:
        register_getent_table("group", gr)
    for fname, entity in (("services", "services"), ("protocols", "protocols")):
        ent = []
        for ln in lines(fname):
            parts = ln.split("#")[0].split()
            if len(parts) >= 2 and "/" in parts[1] or (entity == "protocols" and len(parts) >= 2):
                num = parts[1].split("/")[0]
                if num.isdigit():
                    ent.append({"name": parts[0], "number": num})
        if ent:
            register_getent_table(entity, ent)


def _getent_flat(entity: str) -> dict:
    """Flatten an entity's entries to '<key>\\x1f<member>' -> value for
    BOTH key spellings (name and numeric id), so the per-row branch is
    only the default-member choice, not the lookup direction."""
    entries = _GETENT_TABLES.get(entity)
    if entries is None:
        raise ValueError(
            f"$(getent {entity}): no table registered — call "
            "register_getent_table() or load_getent_from_os() first"
        )
    flat = {}
    for e in entries:
        if entity in ("services", "protocols"):
            # services: numeric key -> name, name key -> number; the
            # member argument is ignored (getent-services.c)
            flat.setdefault(f"{e['number']}\x1f", e["name"])
            flat.setdefault(f"{e['name']}\x1f", str(e["number"]))
            continue
        num_key = str(e.get("uid" if entity == "passwd" else "gid"))
        for member, v in e.items():
            val = ",".join(v) if isinstance(v, list) else str(v)
            flat.setdefault(f"{e['name']}\x1f{member}", val)
            flat.setdefault(f"{num_key}\x1f{member}", val)
    return flat


def getent(entity: str, key: Column | str, member: str | None = None) -> Column:
    """$(getent entity key [member]) as a Column (modules/getent/
    tfgetent.c): passwd/group lookups by name or numeric id with the
    reference's member defaults (numeric key → 'name', name key → the
    id field); group 'members' renders comma-joined; services/protocols
    translate name↔number. Unknown keys yield NULL (the reference emits
    nothing)."""
    key_c = F.col(key) if isinstance(key, str) else key
    key_c = key_c.cast("string")
    flat = _getent_flat(entity)
    lits = []
    for k, v in flat.items():
        lits += [F.lit(k), F.lit(v)]
    m = F.create_map(*lits) if lits else F.create_map().cast("map<string,string>")
    if entity in ("services", "protocols"):
        lookup_member = F.lit("")
    elif member is not None:
        lookup_member = F.lit(member)
    else:
        num_d, str_d = _GETENT_DEFAULTS[entity]
        lookup_member = F.when(
            key_c.rlike("^[0-9]+$"), F.lit(num_d)
        ).otherwise(F.lit(str_d))
    return F.element_at(m, F.concat(key_c, F.lit("\x1f"), lookup_member))


def getent_enrich(
    df: DataFrame,
    entity: str,
    key_col: str,
    member: str | None = None,
    target: str = "getent",
) -> DataFrame:
    """Bulk enrichment column built on ``getent`` — the literal map rides
    the plan (equivalent to a broadcast hash lookup; for tables too big
    to inline, join ``spark.createDataFrame(entries)`` with
    ``F.broadcast`` instead, the dns_resolve_ip shape above)."""
    return df.withColumn(target, getent(entity, key_col, member))
