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
