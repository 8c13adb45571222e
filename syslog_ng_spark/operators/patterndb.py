"""PatternDB: multi-pattern classification + typed value extraction.

The reference compiles thousands of rule patterns (literal runs + typed
wildcards ``@ESTRING@ @NUMBER@ @IPv4@ @QSTRING@ @PCRE@ @SET@ ...``) into a
radix tree per program for one-pass dispatch
(/root/reference/modules/correlation/radix.c:667-816, pdb-rule.h:37-38).

Spark-first rebuild:
- rules are compiled ONCE at plan time into named-group regexes,
  bucketed by program (mirroring pdb-program.c's per-program radix);
- the whole ruleset travels to executors as a broadcast-sized closure of
  plain strings (compiled lazily per worker, cached);
- matching runs inside ONE vectorized Arrow UDF: per batch, rows are
  grouped by program and each rule is applied with pandas vectorized
  ``str.match`` over only the still-unmatched rows — no per-row Python
  dispatch, work is proportional to (#rules_in_bucket × unmatched rows).

On match the row gets ``.classifier.class`` / ``.classifier.rule_id``
analogues (``pdb_class``, ``pdb_rule_id``), extracted values as a map,
and the rule's tags.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class PdbRule:
    rule_id: str
    klass: str  # 'violation', 'security', 'system', ... (.classifier.class)
    program: str  # exact program bucket ('' = any program)
    pattern: str  # pattern with @WILDCARD@ parsers
    tags: tuple[str, ...] = ()
    # static <value name="n">template</value> entries: evaluated on match
    # with ${capture} references resolved from the extracted values
    # (synthetic-message.c value templates, restricted to value refs)
    values: tuple[tuple[str, str], ...] = ()
    # correlation context (pdb-rule.h SyntheticContext): rules carrying a
    # context-id open/join a correlation context; see pdb_correlate()
    context_id: str | None = None  # template, e.g. "${pid}"
    context_timeout: int | None = None  # seconds of event-time silence
    context_scope: str = "process"  # global|host|program|process


@dataclass(frozen=True)
class PdbXmlAction:
    """<action> element of a rule (pdb-action.h): trigger match|timeout,
    optional rate "N/quantum", synthetic message templates, and an
    optional create-context target."""

    rule_id: str
    trigger: str = "match"  # RAT_MATCH | RAT_TIMEOUT
    rate: str | None = None  # "5/60" → 5 per 60s
    message: tuple[tuple[str, str], ...] = ()
    inherit_properties: str | None = None
    create_context: tuple | None = None  # (context_id_tpl, timeout, scope)


# wildcard → (regex template, needs_param). {n} = group name, {p} = param.
_WILDCARDS = {
    "ESTRING": lambda n, p: f"(?P<{n}>[^{re.escape(p)}]*){re.escape(p)}"
    if p
    else f"(?P<{n}>.*)$",
    "QSTRING": lambda n, p: f"{re.escape(p[0])}(?P<{n}>[^{re.escape(p[-1])}]*){re.escape(p[-1])}"
    if p
    else f'"(?P<{n}>[^"]*)"',
    "STRING": lambda n, p: f"(?P<{n}>\\S+)",
    "ANYSTRING": lambda n, p: f"(?P<{n}>.*)",
    "NUMBER": lambda n, p: f"(?P<{n}>[0-9]+)",
    "FLOAT": lambda n, p: f"(?P<{n}>[0-9]+(?:\\.[0-9]+)?)",
    "DOUBLE": lambda n, p: f"(?P<{n}>[0-9]+(?:\\.[0-9]+)?)",
    "IPv4": lambda n, p: f"(?P<{n}>(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}})",
    "IPv6": lambda n, p: f"(?P<{n}>[0-9a-fA-F:]+)",
    "HOSTNAME": lambda n, p: f"(?P<{n}>[\\w.-]+)",
    "PCRE": lambda n, p: f"(?P<{n}>{p})",
    "SET": lambda n, p: f"(?P<{n}>[{re.escape(p)}]+)",
    "EMAIL": lambda n, p: f"(?P<{n}>[\\w.+-]+@[\\w.-]+)",
}

_WILD_RE = re.compile(r"@([A-Za-z0-9]+)(?::([\w.]*))?(?::((?:[^@\\]|\\.)*))?@")


def compile_pattern(pattern: str) -> str:
    """syslog-ng pdb pattern → start-anchored named-group regex string.

    Scans left-to-right like r_insert_node (radix.c:1011-1060): ``@@``
    is an ESCAPED literal ``@`` (radix.c:1022-1053), otherwise ``@`` opens
    a parser spec closed by the next ``@``. A lone trailing/unpaired
    ``@`` is kept as a literal (the reference logs "Unescaped @" and
    rejects the rule; leniency is the batch-friendly divergence).

    No end anchor here — the matcher runs a COMPLETE-match pass first
    (pattern must consume the whole message) and falls back to a
    prefix/partial pass only for rows no rule fully matched, mirroring
    radix.c _find_node_with_state: a complete match by a later rule
    beats a prefix match by an earlier one."""
    out: list[str] = ["^"]
    anon = [0]
    lit: list[str] = []

    def groupname(name: str | None) -> str:
        if name:
            return "g_" + name.replace(".", "_")
        anon[0] += 1
        return f"anon{anon[0]}"

    def flush():
        if lit:
            out.append(re.escape("".join(lit)))
            lit.clear()

    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch != "@":
            lit.append(ch)
            i += 1
            continue
        if i + 1 < len(pattern) and pattern[i + 1] == "@":
            lit.append("@")  # escaped literal @
            i += 2
            continue
        m = _WILD_RE.match(pattern, i)
        if m is None:  # unpaired @ — lenient literal
            lit.append("@")
            i += 1
            continue
        flush()
        kind = m.group(1)
        name = groupname(m.group(2))
        param = m.group(3) or ""
        builder = _WILDCARDS.get(kind)
        if builder is None:
            raise ValueError(f"unknown pdb wildcard @{kind}@ in {pattern!r}")
        out.append(builder(name, param))
        i = m.end()
    flush()
    return "".join(out)


@lru_cache(maxsize=64)
def _compile_ruleset(spec: tuple) -> dict:
    """(rule_id, class, program, regex_src, tags, statics)* →
    {program: (program_regex_or_None, [compiled rules])} with
    (complete-match, prefix-match) regex variants per rule.

    Program names are PATTERNS in the reference, not literals — the
    <ruleset> pattern element goes through the same radix compiler as
    message patterns (modules/correlation/pdb-program.c, radix.c:667),
    so ``ssh@ESTRING@@`` buckets every sshd/ssh-agent variant. Here a
    program containing a @WILDCARD@ compiles to a complete-match regex
    evaluated vectorized against the program column; literal programs
    stay exact-equality dispatch (the fast path).

    Cached per worker process — the compile cost is paid once per
    executor, not per batch (the broadcast-of-compiled-automaton trick).
    """
    buckets: dict[str, list] = {}
    prog_res: dict[str, re.Pattern | None] = {}
    for rule_id, klass, program, regex_src, tags, statics in spec:
        if program not in prog_res:
            prog_res[program] = (
                re.compile(compile_pattern(program) + r"\Z")
                if program and _WILD_RE.search(program)
                else None
            )
        buckets.setdefault(program, []).append(
            (
                rule_id,
                klass,
                re.compile(regex_src + r"\Z"),
                re.compile(regex_src),
                tags,
                statics,
            )
        )
    return {p: (prog_res[p], rules) for p, rules in buckets.items()}


_VALUE_REF = re.compile(r"\$\{([\w.]+)\}")


def _apply_statics(statics, captured: dict) -> dict:
    """Evaluate a rule's static <value> templates against the captured
    values (restricted ${name} substitution) and merge them in."""
    out = dict(captured)
    for name, tpl in statics:
        out[name] = _VALUE_REF.sub(lambda m: out.get(m.group(1), ""), tpl)
    return out


_RESULT_TYPE = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("klass", T.StringType()),
        T.StructField("values", T.MapType(T.StringType(), T.StringType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


def patterndb(
    df: DataFrame,
    rules: list[PdbRule],
    program_col: str = "program",
    text_col: str = "msg",
    target: str = "pdb",
) -> DataFrame:
    """Classify rows against the ruleset.

    Adds struct column ``target`` (rule_id, klass, values, tags) plus
    convenience columns ``pdb_class``/``pdb_rule_id`` and
    ``<target>_matched``. Rule priority mirrors the reference's radix
    dispatch: rules are tried in order of DESCENDING literal-prefix
    length (radix.c resolves to the longest shared literal prefix), with
    declaration order as the tiebreaker.
    """
    def _literal_prefix_len(pattern: str) -> int:
        m = _WILD_RE.search(pattern)
        return m.start() if m else len(pattern)

    ordered = sorted(
        enumerate(rules), key=lambda ir: (-_literal_prefix_len(ir[1].pattern), ir[0])
    )
    spec = tuple(
        (
            r.rule_id,
            r.klass,
            r.program,
            compile_pattern(r.pattern),
            tuple(r.tags),
            tuple(getattr(r, "values", ()) or ()),
        )
        for _i, r in ordered
    )

    @F.pandas_udf(_RESULT_TYPE)
    def classify(prog: pd.Series, text: pd.Series) -> pd.DataFrame:
        buckets = _compile_ruleset(spec)
        n = len(text)
        rule_id = pd.Series([None] * n, dtype=object)
        klass = pd.Series([None] * n, dtype=object)
        values = pd.Series([None] * n, dtype=object)
        tags = pd.Series([None] * n, dtype=object)
        prog_f = prog.fillna("")
        # pass 0: complete matches only; pass 1: prefix fallback for rows
        # that no rule consumed entirely (radix.c partial-match order).
        for phase in (0, 1):
          for program, (prog_re, bucket) in buckets.items():
            if prog_re is not None:  # wildcard program pattern (pdb-program.c)
                in_bucket = prog_f.str.match(prog_re).fillna(False)
            elif program:
                in_bucket = prog_f == program
            else:
                in_bucket = pd.Series(True, index=text.index)
            pending = in_bucket & text.notna() & rule_id.isna()
            if not pending.any():
                continue
            for rid, kls, creg_full, creg_prefix, rtags, statics in bucket:
                creg = creg_full if phase == 0 else creg_prefix
                if not pending.any():
                    break
                sub = text[pending]
                if creg.groups == 0:  # pure literal rule — no capture groups
                    hit = sub.str.match(creg).fillna(False)
                    hit_idx = sub.index[hit]
                    vals = pd.Series([{}] * len(hit_idx), index=hit_idx)
                else:
                    ext = sub.str.extract(creg)  # vectorized over the batch
                    hit_idx = ext.dropna(how="all").index
                    hit_rows = ext.loc[hit_idx]
                    named = [c for c in hit_rows.columns if str(c).startswith("g_")]
                    vals = hit_rows[named].apply(
                        lambda row: {
                            str(c)[2:].replace("_", "."): v
                            for c, v in row.items()
                            if v is not None and v == v
                        },
                        axis=1,
                    ) if named else pd.Series([{}] * len(hit_idx), index=hit_idx)
                if len(hit_idx):
                    if statics:
                        vals = vals.map(lambda d: _apply_statics(statics, d))
                    rule_id.loc[hit_idx] = rid
                    klass.loc[hit_idx] = kls
                    values.loc[hit_idx] = vals
                    tags.loc[hit_idx] = pd.Series([list(rtags)] * len(hit_idx), index=hit_idx)
                    pending.loc[hit_idx] = False
        return pd.DataFrame(
            {"rule_id": rule_id, "klass": klass, "values": values, "tags": tags}
        )

    prog_c = F.col(program_col) if isinstance(program_col, str) else program_col
    out = df.withColumn(target, classify(prog_c, F.col(text_col)))
    return (
        out.withColumn("pdb_rule_id", F.col(f"{target}.rule_id"))
        .withColumn("pdb_class", F.col(f"{target}.klass"))
        .withColumn(target + "_matched", F.col(f"{target}.rule_id").isNotNull())
    )


# ---------------------------------------------------------------------------
# correlation actions (pdb-action.h:39-62 RAC_MESSAGE, pdb-ratelimit.c)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PdbAction:
    """on-match action: emit a synthetic message built from templates.

    ``message``: output column → template string; templates may reference
    the rule's extracted values (``${name}``) plus any input column.
    ``rate_limit``: max syntheses per (rule, key template, event-time
    second) — the pdb-ratelimit.c analogue, batch-exact per second.
    """

    rule_id: str
    message: dict  # out column -> template string
    rate_limit: int | None = None
    rate_key: str | None = None  # column name used as the rate-limit key
    condition: object = None  # Column | None


def pdb_actions(
    classified: DataFrame,
    actions: list[PdbAction],
    ts_col: str = "ts",
    target: str = "pdb",
) -> DataFrame:
    """Generate synthetic rows for every triggered action (the reference
    unions them back into the stream — do that with
    ``df.unionByName(pdb_actions(...), allowMissingColumns=True)``).

    One filtered projection per action over the already-classified frame;
    extracted values are exposed to templates through the nv map.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from ..functions.templates import compile_template  # noqa: PLC0415

    frames = []
    for act in actions:
        src = classified.filter(F.col(f"{target}.rule_id") == act.rule_id)
        if act.condition is not None:
            src = src.filter(act.condition)
        if act.rate_limit is not None:
            key = F.col(act.rate_key) if act.rate_key else F.lit("")
            sec = F.unix_timestamp(F.col(ts_col))
            w = Window.partitionBy(key, sec).orderBy(F.col(ts_col))
            src = (
                src.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= act.rate_limit)
                .drop("_rn")
            )
        # expose extracted values as the nv map for template resolution
        src = src.withColumn("nv", F.col(f"{target}.values"))
        cols = [
            compile_template(tpl, set(src.columns)).alias(name)
            for name, tpl in act.message.items()
        ]
        frames.append(
            src.select(
                F.lit(act.rule_id).alias("action_rule_id"),
                F.col(ts_col).alias(ts_col),
                *cols,
            )
        )
    if not frames:
        raise ValueError("no actions given")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


# ---------------------------------------------------------------------------
# XML ruleset loader (pdb-load.c analogue, patterndb formats v1–v5)
# ---------------------------------------------------------------------------


def load_patterndb_xml(xml_source: str) -> tuple[list[PdbRule], list[PdbXmlAction]]:
    """Parse a patterndb XML ruleset into (rules, actions).

    Grammar per /root/reference/modules/correlation/pdb-load.c: a
    <patterndb> holds <ruleset> (v3+) or <program> (v1/v2) elements, each
    with program name pattern(s) and <rules>. A <rule> carries id/class/
    provider plus optional context-id/context-timeout/context-scope
    attributes, <patterns>/<pattern>, <tags>, <values> and <actions>.
    A rule with several <pattern> elements expands to one PdbRule per
    pattern (same rule_id — the reference inserts each into the radix).

    ``xml_source``: XML text, or a filesystem path to it.
    """
    import os
    import xml.etree.ElementTree as ET

    if "\n" not in xml_source and os.path.exists(xml_source):
        with open(xml_source, encoding="utf-8") as fh:
            xml_source = fh.read()
    root = ET.fromstring(xml_source)
    if root.tag != "patterndb":
        raise ValueError(f"expected <patterndb> root, got <{root.tag}>")

    rules: list[PdbRule] = []
    actions: list[PdbXmlAction] = []

    def _texts(parent, single, plural):
        """pattern / patterns>pattern (both spellings allowed everywhere)."""
        out = [e.text or "" for e in parent.findall(single)]
        grp = parent.find(plural)
        if grp is not None:
            out.extend(e.text or "" for e in grp.findall(single))
        return out

    def _values_of(parent):
        grp = parent.find("values")
        items = grp.findall("value") if grp is not None else parent.findall("value")
        return tuple((v.attrib["name"], v.text or "") for v in items)

    for rs in list(root):
        if rs.tag not in ("ruleset", "program"):
            continue
        programs = _texts(rs, "pattern", "patterns") or [rs.attrib.get("name", "")]
        rules_el = rs.find("rules")
        if rules_el is None:
            continue
        for rule_el in rules_el.findall("rule"):
            a = rule_el.attrib
            rid = a.get("id", "")
            klass = a.get("class", "system")
            tags_el = rule_el.find("tags")
            tags = tuple(
                t.text or "" for t in (tags_el.findall("tag") if tags_el is not None else [])
            )
            vals = _values_of(rule_el)
            ctx_id = a.get("context-id")
            ctx_timeout = int(a["context-timeout"]) if "context-timeout" in a else None
            ctx_scope = a.get("context-scope", "process")
            pats = _texts(rule_el, "pattern", "patterns")
            for prog in programs:
                for pat in pats:
                    rules.append(
                        PdbRule(
                            rid, klass, prog, pat, tags, vals,
                            ctx_id, ctx_timeout, ctx_scope,
                        )
                    )
            acts_el = rule_el.find("actions")
            for act_el in acts_el.findall("action") if acts_el is not None else []:
                aa = act_el.attrib
                msg_el = act_el.find("message")
                cc_el = act_el.find("create-context")
                create_ctx = None
                if cc_el is not None:
                    ca = cc_el.attrib
                    # NOTE: `find(...) or msg_el` would be wrong — a
                    # childless Element (e.g. self-closed <message
                    # inherit-properties="TRUE"/>) is FALSY, silently
                    # falling back to the action-level message.
                    cc_msg = cc_el.find("message")
                    if cc_msg is not None:
                        msg_el = cc_msg
                    create_ctx = (
                        ca.get("context-id", ""),
                        int(ca.get("context-timeout", "0")),
                        ca.get("context-scope", "process"),
                    )
                actions.append(
                    PdbXmlAction(
                        rule_id=rid,
                        trigger=aa.get("trigger", "match"),
                        rate=aa.get("rate"),
                        message=_values_of(msg_el) if msg_el is not None else (),
                        inherit_properties=(
                            msg_el.attrib.get("inherit-properties")
                            if msg_el is not None
                            else None
                        ),
                        create_context=create_ctx,
                    )
                )
    return rules, actions


# ---------------------------------------------------------------------------
# correlation contexts (pdb-context.c / SyntheticContext analogue)
# ---------------------------------------------------------------------------


def _eval_value_template(tpl: str, values_col, df_cols: set[str]):
    """${name} template → Column: names resolve against the extracted
    values map first, then same-named input columns; literal text
    passes through. The restricted form synthetic messages use."""
    parts = re.split(r"(\$\{[\w.]+\})", tpl)
    cols = []
    for p in parts:
        if not p:
            continue
        m = re.fullmatch(r"\$\{([\w.]+)\}", p)
        if m:
            name = m.group(1)
            v = F.element_at(values_col, name)
            if name in df_cols:
                v = F.coalesce(v, F.col(name).cast("string"))
            cols.append(F.coalesce(v, F.lit("")))
        else:
            cols.append(F.lit(p))
    return F.concat(*cols) if len(cols) > 1 else (cols[0] if cols else F.lit(""))


def pdb_correlate(
    classified: DataFrame,
    rules: list[PdbRule],
    ts_col: str = "ts",
    target: str = "pdb",
    emit: str = "contexts",
    actions: list[PdbXmlAction] | None = None,
) -> DataFrame:
    """Batch analogue of PatternDB correlation contexts (patterndb.c:711,
    pdb-context.c): rows whose matched rule carries ``context-id``
    open/join a context keyed by (scope label, scope column values,
    evaluated context-id) — NOT the rule: two rules evaluating to the
    same scope + context-id share one context, as in correlation-key.c.
    A ``create-context`` action (RAC_CREATE_CONTEXT) is one more context
    definition: rows matching the action's rule also join the context it
    names (the reference injects the action's synthetic message there;
    batch divergence: the TRIGGERING row is the member, the synthetic
    content renders from it at emit time). A context closes after
    ``context-timeout`` seconds of event-time silence; the timer is the
    one armed by the PREVIOUS message's rule (timer re-arm semantics).
    Emits one row per closed context with ``context_len`` / first / last
    timestamps — the quantities ``$(context-length)`` and timeout
    actions observe.

    ``emit='contexts'`` returns the context table;
    ``emit='timeout-actions'`` returns synthetic rows for the rules'
    trigger="timeout" actions, templates evaluated over the context's
    LAST message values (pdb-action triggers fire at context expiry).

    Spark shape: one explode (a row can join several contexts), one
    window (ctxkey ordered by time) for sessionization, one aggregate —
    the grouping-by two-shuffle plan; no per-row Python.
    """
    from .grouping import scope_keys, sessionize  # noqa: PLC0415

    rid_col = F.col(f"{target}.rule_id")
    vals_col = F.col(f"{target}.values")
    df_cols = set(classified.columns)

    def _ctx_key(scope: str, ctx_id_tpl: str):
        scope_cols = [c for c in scope_keys(scope) if c in df_cols]
        return F.concat_ws(
            "\x1f",
            F.lit(scope),
            *[F.col(c).cast("string") for c in scope_cols],
            _eval_value_template(ctx_id_tpl, vals_col, df_cols),
        )

    # context definitions: (condition, key, timeout) from rules carrying
    # a context-id plus create-context actions
    defs = []
    seen: set[tuple] = set()
    for r in rules:
        if r.context_id and (r.rule_id, r.context_id) not in seen:
            seen.add((r.rule_id, r.context_id))
            defs.append(
                (
                    rid_col == r.rule_id,
                    _ctx_key(r.context_scope, r.context_id),
                    float(r.context_timeout or 0),
                )
            )
    for act in actions or []:
        if act.create_context is not None:
            cc_id, cc_timeout, cc_scope = act.create_context
            defs.append(
                (
                    rid_col == act.rule_id,
                    _ctx_key(cc_scope, cc_id),
                    float(cc_timeout or 0),
                )
            )
    if not defs:
        raise ValueError("no rule carries a context-id and no create-context action given")

    memberships = F.filter(
        F.array(
            *[
                F.when(cond, F.struct(key.alias("k"), F.lit(to).alias("to")))
                for cond, key, to in defs
            ]
        ),
        lambda m: m.isNotNull(),
    )
    src = (
        classified.withColumn("_m", F.explode(memberships))
        .withColumn("_ctx_key", F.col("_m.k"))
        .withColumn("_ctx_timeout", F.col("_m.to"))
        .drop("_m")
    )
    src = sessionize(src, ["_ctx_key"], timeout="_ctx_timeout", ts_col=ts_col)
    contexts = (
        src.groupBy("_ctx_key", "ctx_id")
        .agg(
            # the context belongs to the rule of its FIRST message (the
            # creator) — pdb-context.c stores rule_ref at context birth,
            # and timeout actions fire from that rule even after other
            # rules' messages merged in
            F.min_by(rid_col, F.col(ts_col)).alias("rule_id"),
            F.count(F.lit(1)).alias("context_len"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            F.max_by(vals_col, F.col(ts_col)).alias("last_values"),
        )
        .withColumn(
            "context_id",
            F.element_at(F.split("_ctx_key", "\x1f", -1), -1),
        )
        .drop("_ctx_key", "ctx_id")
    )
    if emit == "contexts":
        return contexts
    if emit != "timeout-actions":
        raise ValueError(f"unknown emit mode {emit!r}")

    frames = []
    ctx_cols = set(contexts.columns)
    for act in actions or []:
        if act.trigger != "timeout":
            continue
        src_a = contexts.filter(F.col("rule_id") == act.rule_id)
        out_cols = [
            _eval_value_template(tpl, F.col("last_values"), ctx_cols).alias(name)
            for name, tpl in act.message
        ]
        frames.append(
            src_a.select(
                F.lit(act.rule_id).alias("action_rule_id"),
                F.col("last_ts").alias(ts_col),
                F.col("context_len"),
                *out_cols,
            )
        )
    if not frames:
        raise ValueError("no trigger=timeout actions among the given actions")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
