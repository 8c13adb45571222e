"""PatternDB correlation-action tests (pdb-action.h RAC_MESSAGE +
pdb-ratelimit.c analogues)."""

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators.patterndb import PdbAction, PdbRule, patterndb, pdb_actions

RULES = [
    PdbRule("r_fail", "violation", "sshd", "Failed password for @ESTRING:user: @from @IPv4:src@"),
    PdbRule("r_ok", "security", "sshd", "Accepted password for @ESTRING:user: @"),
]


def _df(spark):
    base = datetime.datetime(2026, 3, 1)
    rows = []
    for i in range(6):
        rows.append(
            ("sshd", f"Failed password for bob from 10.0.0.{i} ", base + datetime.timedelta(seconds=i // 3))
        )
    rows.append(("sshd", "Accepted password for alice ", base))
    return spark.createDataFrame(rows, "program string, msg string, ts timestamp")


def test_synthetic_messages(spark):
    df = patterndb(_df(spark), RULES)
    out = pdb_actions(
        df,
        [
            PdbAction("r_fail", {"alert": "failed login for ${user} from ${src}"}),
            PdbAction("r_ok", {"alert": "ok ${user}"}),
        ],
    )
    rows = out.collect()
    fails = [r for r in rows if r.action_rule_id == "r_fail"]
    assert len(fails) == 6
    assert fails[0].alert.startswith("failed login for bob from 10.0.0.")
    oks = [r for r in rows if r.action_rule_id == "r_ok"]
    assert [r.alert for r in oks] == ["ok alice"]


def test_action_rate_limit(spark):
    df = patterndb(_df(spark), RULES)
    out = pdb_actions(
        df,
        [PdbAction("r_fail", {"alert": "x"}, rate_limit=2, rate_key="program")],
    )
    # 6 fail rows over 2 distinct seconds → 2 per second allowed = 4
    assert out.count() == 4


def test_union_back_inject(spark):
    df = patterndb(_df(spark), RULES)
    synth = pdb_actions(df, [PdbAction("r_fail", {"alert": "a"})])
    merged = df.unionByName(synth, allowMissingColumns=True)
    assert merged.count() == df.count() + 6
