"""Declarative pipeline spec → running DAG (the cfg-tree compile, §3.1).

The reference parses syslog-ng.conf into a LogExprNode tree and lowers it
to a LogPipe graph (/root/reference/lib/cfg-tree.c:1027-1216). Here the
"config" is a plain dict (JSON/YAML-friendly) and "compilation" builds
DataFrame lineage: named filters, a parser chain, rewrites, and log
paths — Catalyst is the optimizer, ``Pipeline.route`` the multiplexer.

Spec shape::

    {
      "filters": {                       # named filter expressions
        "f_sev":  {"severity": ["err..emerg"]},
        "f_bash": {"cmp": {"lhs": "tool", "op": "==", "rhs": "bash"}},
        "f_both": {"and": ["f_sev", {"match": {"value": "text", "pattern": "x"}}]},
      },
      "parsers": [                       # ordered parse stages
        {"type": "syslog"},
        {"type": "kv", "source": "msg"},
      ],
      "rewrites": [                      # ordered rewrite stages
        {"type": "set", "name": "combined", "value": "$host/$program"},
        {"type": "set_tag", "tag": "seen"},
      ],
      "paths": [                         # the log-path forest, in order
        {"name": "security", "filter": "f_sev", "flags": ["final"]},
        {"name": "rest", "flags": ["fallback"]},
      ],
    }
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import filters as FL
from .pipeline import LogPath, Pipeline


def compile_filter(spec, named: dict) -> FL.FilterExpr:
    """Lower one filter spec node (dict | name-reference) to a FilterExpr.

    A LIST of specs is the reference's multi-statement filter block —
    ``filter f { not program("x"); message("y"); }`` ANDs its statements
    implicitly (tests/light test_multiple_filters.py)."""
    if isinstance(spec, list):
        return FL.FAnd(*[compile_filter(s, named) for s in spec])
    if isinstance(spec, str):
        if spec in named:
            return named[spec]
        return FL.FRaw(spec)  # raw SQL snippet
    if isinstance(spec, FL.FilterExpr):
        return spec
    assert isinstance(spec, dict) and len(spec) == 1, f"bad filter spec {spec!r}"
    kind, arg = next(iter(spec.items()))
    if kind == "and":
        return FL.FAnd(*[compile_filter(a, named) for a in arg])
    if kind == "or":
        return FL.FOr(*[compile_filter(a, named) for a in arg])
    if kind == "not":
        return FL.FNot(compile_filter(arg, named))
    if kind == "cmp":
        return FL.FCmp(
            F.col(arg["lhs"]),
            arg["rhs"] if not isinstance(arg["rhs"], str) or not arg.get("rhs_is_column")
            else F.col(arg["rhs"]),
            arg.get("op", "=="),
            arg.get("mode", "type_aware"),
        )
    if kind == "match":
        return FL.FMatch(
            F.col(arg.get("value", "text")),
            arg["pattern"],
            arg.get("matcher", "pcre"),
            frozenset(arg.get("flags", [])),
        )
    if kind == "severity":
        return FL.FSeverity(*arg)
    if kind == "facility":
        return FL.FFacility(*arg)
    if kind == "tags":
        return FL.FTags(*arg)
    if kind == "netmask":
        return FL.FNetmask(arg["cidr"], F.col(arg.get("value", "src_ip")))
    if kind == "in_list":
        return FL.FInList(arg["values"], F.col(arg.get("value", "text")))
    if kind == "blank":
        return FL.FBlank(F.col(arg.get("value", "text")))
    if kind == "raw":
        return FL.FRaw(arg)
    raise ValueError(f"unknown filter kind {kind!r}")


def _apply_parser(df: DataFrame, spec: dict) -> DataFrame:
    from ..operators import parsers as P  # noqa: PLC0415

    kind = spec["type"]
    kw = {k: v for k, v in spec.items() if k != "type"}
    if kind == "syslog":
        return P.syslog_parser(df, **kw)
    if kind == "kv":
        return P.kv_parser(df, **kw)
    if kind == "json":
        return P.json_parser(df, **kw)
    if kind == "csv":
        return P.csv_parser(df, **kw)
    if kind == "regexp":
        return P.regexp_parser(df, **kw)
    if kind == "date":
        return P.date_parser(df, **kw)
    if kind == "xml":
        return P.xml_parser(df, **kw)
    if kind == "tags":
        return P.tags_parser(df, **kw)
    if kind == "patterndb":
        from ..operators.patterndb import PdbRule, patterndb  # noqa: PLC0415

        rules = [PdbRule(**r) for r in kw.pop("rules")]
        return patterndb(df, rules, **kw)
    if kind == "patterndb_xml":
        # db-parser(file('patterndb.xml')) — the reference's usual form
        from ..operators.patterndb import load_patterndb_xml, patterndb  # noqa: PLC0415

        rules, _actions = load_patterndb_xml(kw.pop("xml"))
        return patterndb(df, rules, **kw)
    if kind == "group_lines":
        return P.group_lines(df, **kw)
    if kind in _SCL_PARSERS:
        from ..operators import scl  # noqa: PLC0415

        return getattr(scl, _SCL_PARSERS[kind])(df, **kw)
    raise ValueError(f"unknown parser type {kind!r}")


# SCL preset parser kinds accepted in config specs (scl/<name> analogues)
_SCL_PARSERS = {
    "apache-accesslog": "apache_accesslog_parser",
    "cisco": "cisco_parser",
    "postgresql-csvlog": "postgresql_csvlog_parser",
    "mariadb-audit": "mariadb_audit_parser",
    "panos": "panos_parser",
    "sdata": "sdata_parser",
    "app": "app_parser",
    "windows-eventlog": "windows_eventlog_parser",
    "sudo": "sudo_parser",
    "iptables": "iptables_parser",
    "linux-audit": "linux_audit_parser",
    "fortigate": "fortigate_parser",
    "osquery": "osquery_parser",
    "cee": "cee_parser",
    "ewmm": "ewmm_parser",
    "websense": "websense_parser",
    "checkpoint": "checkpoint_parser",
    "pihole-ftl": "pihole_ftl_parser",
    "default-network-drivers": "default_network_drivers",
}


def _apply_rewrite(df: DataFrame, spec: dict, named: dict) -> DataFrame:
    from ..operators import rewrite as RW  # noqa: PLC0415

    kind = spec["type"]
    kw = {k: v for k, v in spec.items() if k != "type"}
    if "condition" in kw:
        kw["condition"] = compile_filter(kw["condition"], named)
    if kind == "set":
        return RW.set_value(df, kw["name"], kw["value"], kw.get("condition"))
    if kind == "subst":
        return RW.subst(
            df, kw["pattern"], kw["replacement"], kw["value"],
            kw.get("global", False), kw.get("condition"),
        )
    if kind == "unset":
        return RW.unset(df, *kw["names"], condition=kw.get("condition"))
    if kind == "set_tag":
        return RW.set_tag(df, kw["tag"], kw.get("condition"))
    if kind == "clear_tag":
        return RW.clear_tag(df, kw["tag"], kw.get("condition"))
    if kind == "set_severity":
        return RW.set_severity(df, kw["severity"], kw.get("condition"))
    if kind == "set_facility":
        return RW.set_facility(df, kw["facility"], kw.get("condition"))
    if kind == "rename":
        return RW.rename(df, kw["old"], kw["new"])
    if kind == "cc_mask":
        return RW.credit_card_mask(df, kw["source"], kw.get("target"))
    if kind == "cc_hash":
        return RW.credit_card_hash(df, kw["source"], kw.get("target"))
    if kind == "guess_timezone":
        return RW.guess_timezone(df, **kw)
    if kind == "pii_scrub":  # generalized cc_mask (operators/pii.py)
        from ..operators.pii import pii_scrub  # noqa: PLC0415

        return pii_scrub(
            df, kw.get("value", "message"),
            kinds=tuple(kw["kinds"]) if "kinds" in kw else None,
            target=kw.get("target"),
        )
    if kind == "normalize":  # unicode canonicalize (operators/normalize.py)
        from ..operators.normalize import normalize_text  # noqa: PLC0415

        return normalize_text(df, kw.pop("value", "message"), **kw)
    raise ValueError(f"unknown rewrite type {kind!r}")


class CompiledConfig:
    """The lowered pipeline: stage functions + a routing Pipeline."""

    def __init__(self, spec: dict):
        self.spec = spec
        self.named_filters: dict[str, FL.FilterExpr] = {}
        for name, fspec in (spec.get("filters") or {}).items():
            self.named_filters[name] = compile_filter(fspec, self.named_filters)
        paths = []
        for p in spec.get("paths") or []:
            filt = (
                compile_filter(p["filter"], self.named_filters)
                if p.get("filter") is not None
                else None
            )
            transform = None
            if p.get("rewrites") or p.get("parsers"):
                # per-branch stages: a log path's own parser/rewrite chain
                # (runs only on delivered rows, like embedded pipe segments)
                branch_parsers = p.get("parsers") or []
                branch_rewrites = p.get("rewrites") or []
                named = self.named_filters

                def transform(df, _ps=branch_parsers, _rs=branch_rewrites):
                    for ps in _ps:
                        df = _apply_parser(df, ps)
                    for rs in _rs:
                        df = _apply_rewrite(df, rs, named)
                    return df

            paths.append(
                LogPath(
                    p["name"],
                    filt,
                    frozenset(p.get("flags", [])),
                    transform=transform,
                    sources=tuple(p["sources"]) if p.get("sources") else None,
                )
            )
        self.pipeline = Pipeline(paths) if paths else None

    def transform(self, df: DataFrame) -> DataFrame:
        """Run the parser + rewrite chain (the linear pipe segment)."""
        for pspec in self.spec.get("parsers") or []:
            df = _apply_parser(df, pspec)
        for rspec in self.spec.get("rewrites") or []:
            df = _apply_rewrite(df, rspec, self.named_filters)
        return df

    def route(self, df: DataFrame, persist: bool = True, source_col: str | None = None):
        assert self.pipeline is not None, "spec has no paths"
        return self.pipeline.route(self.transform(df), persist, source_col)


def compile_config(spec: dict) -> CompiledConfig:
    return CompiledConfig(spec)
