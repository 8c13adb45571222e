"""PatternDB XML ruleset loader + correlation contexts
(pdb-load.c / pdb-context.c analogues; cases mirror
modules/correlation/tests/test_patterndb.c context assertions)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.patterndb import (
    PdbRule,
    load_patterndb_xml,
    patterndb,
    pdb_correlate,
)

RULESET_XML = """<?xml version='1.0' encoding='UTF-8'?>
<patterndb version='5' pub_date='2026-01-01'>
  <ruleset name='sshd' id='aaaa'>
    <patterns><pattern>sshd</pattern></patterns>
    <rules>
      <rule id='r_login' class='system' provider='test'
            context-id='${user}' context-timeout='60' context-scope='program'>
        <patterns>
          <pattern>Accepted password for @ESTRING:user: @from @IPv4:ip@</pattern>
        </patterns>
        <tags><tag>auth</tag><tag>login</tag></tags>
        <values>
          <value name='event.kind'>authentication-${user}</value>
        </values>
        <actions>
          <action trigger='timeout'>
            <message>
              <value name='MESSAGE'>user ${user} session summary</value>
            </message>
          </action>
        </actions>
      </rule>
      <rule id='r_fail' class='violation' provider='test'>
        <pattern>Failed password for @ESTRING:user: @</pattern>
      </rule>
    </rules>
  </ruleset>
  <program name='legacy_prog'>
    <pattern>legacy</pattern>
    <rules>
      <rule id='r_old' class='system'>
        <pattern>old style @NUMBER:n@</pattern>
      </rule>
    </rules>
  </program>
</patterndb>
"""


@pytest.fixture(scope="module")
def loaded():
    return load_patterndb_xml(RULESET_XML)


def test_loader_rules(loaded):
    rules, actions = loaded
    by_id = {r.rule_id: r for r in rules}
    assert set(by_id) == {"r_login", "r_fail", "r_old"}
    r = by_id["r_login"]
    assert r.program == "sshd"
    assert r.klass == "system"
    assert r.tags == ("auth", "login")
    assert r.values == (("event.kind", "authentication-${user}"),)
    assert r.context_id == "${user}"
    assert r.context_timeout == 60
    assert r.context_scope == "program"
    assert by_id["r_old"].program == "legacy"
    assert len(actions) == 1
    assert actions[0].trigger == "timeout"
    assert actions[0].rule_id == "r_login"


def test_loaded_rules_classify(spark, loaded):
    rules, _ = loaded
    df = spark.createDataFrame(
        [
            ("sshd", "Accepted password for alice from 10.0.0.1"),
            ("sshd", "Failed password for mallory "),
            ("legacy", "old style 42"),
            ("sshd", "something unrelated"),
        ],
        "program string, msg string",
    )
    rows = {r.msg: r for r in patterndb(df, rules).collect()}
    ok = rows["Accepted password for alice from 10.0.0.1"]
    assert ok.pdb_rule_id == "r_login"
    assert ok.pdb["values"]["user"] == "alice"
    assert ok.pdb["values"]["ip"] == "10.0.0.1"
    # static value template evaluated with capture substitution
    assert ok.pdb["values"]["event.kind"] == "authentication-alice"
    assert rows["old style 42"].pdb["values"]["n"] == "42"
    assert rows["something unrelated"].pdb_rule_id is None


def _ts(m, s=0):
    return datetime(2026, 1, 1, 10, m, s)


def test_correlation_contexts(spark, loaded):
    """Two messages for the same user within the 60s timeout join one
    context; a >60s gap or another user opens a new one (the
    test_patterndb.c context-length cases)."""
    rules, actions = loaded
    df = spark.createDataFrame(
        [
            ("h1", "sshd", "Accepted password for alice from 10.0.0.1", _ts(0)),
            ("h1", "sshd", "Accepted password for alice from 10.0.0.2", _ts(0, 30)),
            ("h1", "sshd", "Accepted password for alice from 10.0.0.3", _ts(5)),
            ("h1", "sshd", "Accepted password for bob from 10.0.0.9", _ts(0, 10)),
            ("h1", "sshd", "Failed password for mallory ", _ts(0, 20)),  # no context rule
        ],
        "host string, program string, msg string, ts timestamp",
    )
    classified = patterndb(df, rules)
    ctx = pdb_correlate(classified, rules).collect()
    by = sorted((r.context_id, r.context_len) for r in ctx)
    assert by == [("alice", 1), ("alice", 2), ("bob", 1)]

    synth = pdb_correlate(classified, rules, emit="timeout-actions", actions=actions)
    msgs = sorted((r.MESSAGE, r.context_len) for r in synth.collect())
    assert msgs == [
        ("user alice session summary", 1),
        ("user alice session summary", 2),
        ("user bob session summary", 1),
    ]


def test_cross_rule_and_create_context(spark):
    """correlation-key semantics: contexts key on (scope, context-id) —
    two different rules evaluating to the same context-id share ONE
    context; a create-context action opens a context its own rule does
    not declare (test_patterndb.c 'action-to-create-context' cases)."""
    from syslog_ng_spark.operators.patterndb import PdbXmlAction

    rules = [
        PdbRule("r_open", "system", "", "opened @NUMBER:pid@",
                context_id="${pid}", context_timeout=60, context_scope="global"),
        PdbRule("r_use", "system", "", "used @NUMBER:pid@",
                context_id="${pid}", context_timeout=60, context_scope="global"),
        PdbRule("r_simple", "system", "", "simple message"),
    ]
    actions = [
        PdbXmlAction(rule_id="r_simple", trigger="match",
                     create_context=("999", 60, "global")),
    ]
    df = spark.createDataFrame(
        [
            ("opened 42", _ts(0)),
            ("used 42", _ts(0, 30)),      # joins r_open's context via same id
            ("used 7", _ts(0, 40)),       # its own context
            ("simple message", _ts(1)),   # creates context 999 via action
        ],
        "msg string, ts timestamp",
    )
    classified = patterndb(df, rules, program_col="msg", text_col="msg")
    ctx = pdb_correlate(classified, rules, actions=actions).collect()
    got = sorted((r.context_id, r.context_len) for r in ctx)
    assert got == [("42", 2), ("7", 1), ("999", 1)]


CROSS_CTX_XML = """<?xml version='1.0' encoding='UTF-8'?>
<patterndb version='5'>
  <ruleset name='jobs' id='bbbb'>
    <patterns><pattern>scheduler</pattern></patterns>
    <rules>
      <rule id='r_start' class='system' provider='test'>
        <pattern>job @NUMBER:jid@ started</pattern>
        <actions>
          <action trigger='match'>
            <create-context context-id='${jid}' context-timeout='60'
                            context-scope='global'>
              <message inherit-properties='TRUE'/>
            </create-context>
          </action>
          <action trigger='timeout'>
            <message>
              <value name='MESSAGE'>job ${jid} saw ${context_len} events</value>
            </message>
          </action>
        </actions>
      </rule>
      <rule id='r_prog' class='system' provider='test'
            context-id='${jid}' context-timeout='60' context-scope='global'>
        <pattern>job @NUMBER:jid@ progress</pattern>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""


def test_create_context_joined_by_other_rule_end_to_end(spark):
    """RAC_CREATE_CONTEXT composition (pdb-action.h:39-62 + pdb-context.c
    join path): rule r_start's match action OPENS context ${jid}; rule
    r_prog's rows JOIN the same (global, jid) context via its own
    context-id declaration; the context belongs to its creator, so
    r_start's timeout action fires once over the MERGED context."""
    rules, actions = load_patterndb_xml(CROSS_CTX_XML)
    df = spark.createDataFrame(
        [
            ("scheduler", "job 5 started", _ts(0)),
            ("scheduler", "job 5 progress", _ts(0, 20)),
            ("scheduler", "job 5 progress", _ts(0, 40)),
            ("scheduler", "job 9 progress", _ts(0, 25)),  # own context, no creator
        ],
        "program string, msg string, ts timestamp",
    )
    classified = patterndb(df, rules)
    ctx = pdb_correlate(classified, rules, actions=actions).collect()
    got = sorted((r.context_id, r.context_len, r.rule_id) for r in ctx)
    assert got == [("5", 3, "r_start"), ("9", 1, "r_prog")]

    synth = pdb_correlate(
        classified, rules, emit="timeout-actions", actions=actions
    ).collect()
    assert [(r.MESSAGE, r.context_len) for r in synth] == [
        ("job 5 saw 3 events", 3)
    ]


def test_self_closed_create_context_message_not_ignored():
    """Regression (round-2 bug): a childless <message inherit-properties=
    'TRUE'/> inside <create-context> is a FALSY ElementTree element; the
    loader must still read its attributes instead of silently falling
    back to the action-level <message>."""
    _rules, actions = load_patterndb_xml(CROSS_CTX_XML)
    cc = [a for a in actions if a.create_context is not None]
    assert len(cc) == 1
    assert cc[0].create_context == ("${jid}", 60, "global")
    assert cc[0].inherit_properties == "TRUE"
    assert cc[0].message == ()  # the self-closed element, not the outer one


def test_program_wildcard_pattern(spark):
    """Program names are radix PATTERNS in the reference
    (modules/correlation/pdb-program.c, radix.c:667): a ruleset whose
    program pattern is 'ssh@ANYSTRING@' must classify sshd and ssh-agent
    rows, and must NOT swallow other programs."""
    xml = """<?xml version='1.0'?>
<patterndb version='5'>
  <ruleset name='ssh-family' id='cccc'>
    <patterns><pattern>ssh@ANYSTRING@</pattern></patterns>
    <rules>
      <rule id='r_any_ssh' class='system' provider='test'>
        <pattern>key exchange @ESTRING:algo: @done</pattern>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""
    rules, _ = load_patterndb_xml(xml)
    df = spark.createDataFrame(
        [
            ("sshd", "key exchange kex1 done"),
            ("ssh-agent", "key exchange kex2 done"),
            ("nginx", "key exchange kex3 done"),
        ],
        "program string, msg string",
    )
    out = patterndb(df, rules).select("program", "pdb_rule_id", "pdb.values").collect()
    by_prog = {r.program: r for r in out}
    assert by_prog["sshd"].pdb_rule_id == "r_any_ssh"
    assert by_prog["sshd"]["values"]["algo"] == "kex1"
    assert by_prog["ssh-agent"].pdb_rule_id == "r_any_ssh"
    assert by_prog["nginx"].pdb_rule_id is None


def test_correlation_scope_matrix(spark):
    """correlation-key.c scopes (:29-40): with the same evaluated
    context-id, 'global' merges across hosts+programs, 'host' separates
    per host, 'program' per (host, program), 'process' per (host,
    program, pid) — the scope columns are part of the context key."""
    from syslog_ng_spark.operators.patterndb import PdbRule, patterndb, pdb_correlate

    def run(scope):
        rules = [PdbRule("r", "t", "", "u @NUMBER:uid@",
                         context_id="${uid}", context_timeout=60,
                         context_scope=scope)]
        df = spark.createDataFrame(
            [
                ("h1", "p1", 1, "u 5", _ts(0)),
                ("h1", "p1", 2, "u 5", _ts(0, 10)),   # other pid
                ("h1", "p2", 1, "u 5", _ts(0, 20)),   # other program
                ("h2", "p1", 1, "u 5", _ts(0, 30)),   # other host
            ],
            "host string, program string, pid int, msg string, ts timestamp",
        )
        ctx = pdb_correlate(patterndb(df, rules, program_col="program",
                                      text_col="msg"), rules)
        return sorted(r.context_len for r in ctx.collect())

    assert run("global") == [4]            # one merged context
    assert run("host") == [1, 3]           # h1 (3 rows) + h2 (1)
    assert run("program") == [1, 1, 2]     # (h1,p1)x2, (h1,p2), (h2,p1)
    assert run("process") == [1, 1, 1, 1]  # pid splits the h1/p1 pair


def test_light_db_parser_corpus(spark):
    """Port of tests/light/functional_tests/parsers/db_parser/
    test_db_parser.py: the light suite generates a v5 patterndb XML with
    a ruleset-level <pattern>program_name</pattern> program scope and
    one rule 'some number: @NUMBER:foo@' (class=patterndb), feeds one
    message from a generator source with PROGRAM=program_name, and
    expects the file destination to render 'foo=5 class=patterndb'.
    Here: same XML through load_patterndb_xml -> classify -> the same
    line rendered from the extracted value + class columns."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.patterndb import load_patterndb_xml, patterndb

    # byte-shape of DBParserConfig.write_to (db_parser.py:17-34)
    xml = (
        "<patterndb version=\"5\">"
        "<ruleset name=\"some_name\" id=\"1234\">"
        "<pattern>program_name</pattern>"
        "<rules>"
        "<rule id=\"0\" class=\"patterndb\">"
        "<patterns><pattern>some number: @NUMBER:foo@</pattern></patterns>"
        "</rule>"
        "</rules>"
        "</ruleset>"
        "</patterndb>"
    )
    rules, actions = load_patterndb_xml(xml)
    assert len(rules) == 1 and actions == []
    assert rules[0].program == "program_name"

    df = spark.createDataFrame(
        [("program_name", "some number: 5"), ("other_prog", "some number: 5")],
        "program string, msg string",
    )
    out = patterndb(df, rules, program_col="program", text_col="msg")
    rendered = out.withColumn(
        "line",
        F.concat(
            F.lit("foo="),
            F.coalesce(F.col("pdb.values")["foo"], F.lit("")),
            F.lit(" class="),
            F.coalesce(F.col("pdb_class"), F.lit("")),
        ),
    )
    got = {r.program: r.line for r in rendered.collect()}
    # the generator-source message through the db-parser and the file
    # template (test_db_parser.py:39)
    assert got["program_name"] == "foo=5 class=patterndb"
    # ruleset program scope: a different program never matches the rule
    assert got["other_prog"] == "foo= class="
