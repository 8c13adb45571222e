"""Config-spec → DAG compile tests (cfg-tree analogue, §3.1): the full
parse→rewrite→route pipeline from one declarative dict."""

from syslog_ng_spark.plans.config import compile_config


SPEC = {
    "filters": {
        "f_sev": {"severity": ["err..emerg"]},
        "f_parsed": {"raw": "syslog_matched"},
        "f_secure": {"and": ["f_sev", "f_parsed"]},
        "f_bash": {"cmp": {"lhs": "tool", "op": "==", "rhs": "bash"}},
    },
    "parsers": [
        {"type": "syslog"},
        {"type": "kv", "source": "msg"},
    ],
    "rewrites": [
        {"type": "set", "name": "origin", "value": "$host/$program"},
        {"type": "set_tag", "tag": "secure", "condition": "f_secure"},
    ],
    "paths": [
        {"name": "security", "filter": "f_secure", "flags": ["final"]},
        {"name": "bash", "filter": "f_bash"},
        {"name": "rest", "flags": ["fallback"]},
    ],
}


def test_config_end_to_end(transcripts_df):
    cc = compile_config(SPEC)
    routed = cc.route(transcripts_df, persist=True)
    try:
        m = {r.path: r.route_egress_total for r in routed.metrics().collect()}
        total = transcripts_df.count()
        # final+fallback semantics: every row lands somewhere; bash rows
        # may ALSO be in security (no, security is final → disjoint from bash)
        assert m["security"] + m["rest"] <= total
        assert m["security"] > 0 and m["bash"] > 0 and m["rest"] > 0
        sec = routed.sink("security")
        assert "origin" in sec.columns
        row = sec.limit(1).collect()[0]
        assert "secure" in row.tags
        assert row.pri % 8 <= 3
    finally:
        routed.unpersist()


def test_config_matches_hand_built(transcripts_df):
    """Config-compiled routing must equal the hand-built Pipeline."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions import filters as FL
    from syslog_ng_spark.operators.parsers import kv_parser, syslog_parser
    from syslog_ng_spark.plans import LogPath, Pipeline

    cc = compile_config(SPEC)
    got = {
        r.path: r.route_egress_total
        for r in cc.route(transcripts_df, persist=False).metrics().collect()
    }

    parsed = kv_parser(syslog_parser(transcripts_df), source="msg")
    pipe = Pipeline(
        [
            LogPath("security", FL.FSeverity("err..emerg") & FL.FRaw(F.col("syslog_matched")), frozenset(["final"])),
            LogPath("bash", F.col("tool") == "bash"),
            LogPath("rest", None, frozenset(["fallback"])),
        ]
    )
    want = {
        r.path: r.route_egress_total
        for r in pipe.route(parsed, persist=False).metrics().collect()
    }
    assert got == want


def test_config_filter_kinds(spark):
    from syslog_ng_spark.plans.config import compile_filter

    df = spark.createDataFrame(
        [("10.1.2.3", "hello world", ["t1"])],
        "src_ip string, text string, tags array<string>",
    )
    cases = [
        {"match": {"pattern": "hello"}},
        {"netmask": {"cidr": "10.0.0.0/8"}},
        {"tags": ["t1"]},
        {"in_list": {"values": ["hello world"], "value": "text"}},
        {"not": {"blank": {"value": "text"}}},
        {"or": [{"match": {"pattern": "nope"}}, {"tags": ["t1"]}]},
    ]
    for c in cases:
        expr = compile_filter(c, {})
        assert df.filter(expr.to_column()).count() == 1, c


def test_config_per_path_stages(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "x string, n int")
    cc = compile_config(
        {
            "paths": [
                {
                    "name": "p1",
                    "filter": {"cmp": {"lhs": "n", "op": "==", "rhs": 1}},
                    "rewrites": [{"type": "set", "name": "marker", "value": "hit-$x"}],
                },
                {"name": "rest", "flags": ["fallback"]},
            ]
        }
    )
    routed = cc.route(df, persist=False)
    got = routed.sink("p1").collect()
    assert len(got) == 1 and got[0].marker == "hit-a"
    assert "marker" not in routed.sink("rest").columns


def test_config_patterndb_xml_and_scl_kinds(spark):
    """db-parser from an XML ruleset and SCL preset kinds compile from
    the declarative spec (the syslog-ng.conf analogue surface)."""
    from syslog_ng_spark.plans.config import compile_config

    xml = """<patterndb version='5'>
      <ruleset name='any'><pattern></pattern>
        <rules><rule id='r1' class='system'>
          <pattern>n=@NUMBER:n@</pattern>
        </rule></rules>
      </ruleset></patterndb>"""
    spec = {
        "filters": {},
        "parsers": [
            {"type": "patterndb_xml", "xml": xml, "program_col": "prog", "text_col": "text"},
            {"type": "cisco", "source": "text"},
        ],
        "rewrites": [],
        "paths": [
            {"name": "classified", "filter": "pdb_matched"},
            {"name": "rest", "flags": ["fallback"]},
        ],
    }
    cc = compile_config(spec)
    df = spark.createDataFrame(
        [("", "n=42"), ("", "%SYS-5-CONFIG_I: hi"), ("", "nope")],
        "prog string, text string",
    )
    routed = cc.route(cc.transform(df), persist=False)
    assert routed.sink("classified").count() == 1
    assert routed.sink("rest").count() == 2


def test_config_round3_scl_kinds_compile(spark):
    """Round-3 preset kinds (sudo/iptables/linux-audit/fortigate/osquery/
    cee/ewmm/websense/checkpoint/pihole-ftl/default-network-drivers)
    resolve from the declarative spec and parse end-to-end."""
    from syslog_ng_spark.plans.config import compile_config

    spec = {
        "filters": {},
        "parsers": [
            {"type": "sudo", "source": "text"},
            {"type": "iptables", "source": "text"},
            {"type": "cee", "source": "text"},
        ],
        "rewrites": [],
        "paths": [
            {"name": "sudoers", "filter": "sudo_matched"},
            {"name": "firewall", "filter": "iptables_matched"},
            {"name": "rest", "flags": ["fallback"]},
        ],
    }
    cc = compile_config(spec)
    df = spark.createDataFrame(
        [
            ("alice : TTY=pts/0 ; USER=root ; COMMAND=/bin/ls",),
            ("IN=eth0 OUT= SRC=1.2.3.4 PROTO=TCP DPT=22",),
            ("plain message",),
        ],
        "text string",
    )
    routed = cc.route(df, persist=False)
    assert routed.sink("sudoers").count() == 1
    assert routed.sink("firewall").count() == 1
    assert routed.sink("rest").count() == 1

    # the remaining round-3 kinds at least resolve + compile
    for kind in ("linux-audit", "fortigate", "osquery", "ewmm",
                 "websense", "checkpoint", "pihole-ftl",
                 "default-network-drivers"):
        cc2 = compile_config(
            {"filters": {}, "parsers": [{"type": kind, "source": "text"}],
             "rewrites": [], "paths": [{"name": "all"}]}
        )
        assert cc2.route(df, persist=False).sink("all").count() == 3


def test_config_curation_rewrite_kinds(spark):
    # round 5: pii_scrub / normalize lower into the rewrite chain like
    # cc_mask does.
    spec = {
        "filters": {},
        "parsers": [],
        "rewrites": [
            {"type": "normalize", "value": "text"},
            {"type": "pii_scrub", "value": "text",
             "kinds": ["email", "ipv4"], "target": "clean"},
        ],
        "paths": [{"name": "all"}],
    }
    cc = compile_config(spec)
    df = spark.createDataFrame(
        [("  mail   a@b.co from 1.2.3.4 \x07 café  ",)], "text string"
    )
    row = cc.route(df, persist=False).sink("all").head()
    assert row["text"] == "mail a@b.co from 1.2.3.4 café"
    assert row["clean"] == "mail <EMAIL> from <IP> café"
