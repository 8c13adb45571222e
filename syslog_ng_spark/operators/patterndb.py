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

    No end anchor here — the matcher runs a COMPLETE-match pass first
    (pattern must consume the whole message) and falls back to a
    prefix/partial pass only for rows no rule fully matched, mirroring
    radix.c _find_node_with_state: a complete match by a later rule
    beats a prefix match by an earlier one."""
    out: list[str] = ["^"]
    pos = 0
    anon = [0]

    def groupname(name: str | None) -> str:
        if name:
            return "g_" + name.replace(".", "_")
        anon[0] += 1
        return f"anon{anon[0]}"

    for m in _WILD_RE.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        kind = m.group(1)
        name = groupname(m.group(2))
        param = m.group(3) or ""
        builder = _WILDCARDS.get(kind)
        if builder is None:
            raise ValueError(f"unknown pdb wildcard @{kind}@ in {pattern!r}")
        out.append(builder(name, param))
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return "".join(out)


@lru_cache(maxsize=64)
def _compile_ruleset(
    spec: tuple,
) -> dict[str, list[tuple[str, str, re.Pattern, re.Pattern, tuple[str, ...]]]]:
    """(rule_id, class, program, regex_src, tags)* → {program: [compiled]}
    with (complete-match, prefix-match) regex variants per rule.

    Cached per worker process — the compile cost is paid once per
    executor, not per batch (the broadcast-of-compiled-automaton trick).
    """
    buckets: dict[str, list] = {}
    for rule_id, klass, program, regex_src, tags in spec:
        buckets.setdefault(program, []).append(
            (rule_id, klass, re.compile(regex_src + r"\Z"), re.compile(regex_src), tags)
        )
    return buckets


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
        (r.rule_id, r.klass, r.program, compile_pattern(r.pattern), tuple(r.tags))
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
          for program, bucket in buckets.items():
            in_bucket = (
                prog_f == program if program else pd.Series(True, index=text.index)
            )
            pending = in_bucket & text.notna() & rule_id.isna()
            if not pending.any():
                continue
            for rid, kls, creg_full, creg_prefix, rtags in bucket:
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
                    rule_id.loc[hit_idx] = rid
                    klass.loc[hit_idx] = kls
                    values.loc[hit_idx] = vals
                    tags.loc[hit_idx] = pd.Series([list(rtags)] * len(hit_idx), index=hit_idx)
                    pending.loc[hit_idx] = False
        return pd.DataFrame(
            {"rule_id": rule_id, "klass": klass, "values": values, "tags": tags}
        )

    out = df.withColumn(target, classify(F.col(program_col), F.col(text_col)))
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
