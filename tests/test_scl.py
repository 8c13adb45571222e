"""SCL preset tests (apache-accesslog / cisco / postgresql-csvlog)."""

import datetime

from syslog_ng_spark.operators.scl import (
    apache_accesslog_parser,
    cisco_parser,
    postgresql_csvlog_parser,
)


def _df(spark, lines):
    return spark.createDataFrame([(t,) for t in lines], "text string")


def test_apache_combined(spark):
    line = (
        '192.168.1.9 - frank [10/Oct/2026:13:55:36 +0000] '
        '"GET /index.html HTTP/1.0" 200 2326 "http://ref/" "Mozilla/5.0"'
    )
    row = apache_accesslog_parser(_df(spark, [line, "junk"])).collect()
    ok, bad = row[0], row[1]
    assert ok.apache_matched
    assert ok[".apache.clientip"] == "192.168.1.9"
    assert ok[".apache.verb"] == "GET"
    assert ok[".apache.request"] == "/index.html"
    assert ok[".apache.response"] == 200
    assert ok[".apache.bytes"] == 2326
    assert ok[".apache.agent"] == "Mozilla/5.0"
    assert ok[".apache.stamp"] == datetime.datetime(2026, 10, 10, 13, 55, 36)
    assert not bad.apache_matched


def test_cisco(spark):
    line = "17: %SYS-5-CONFIG_I: Configured from console by vty0"
    row = cisco_parser(_df(spark, [line])).collect()[0]
    assert row.cisco_matched
    assert row[".cisco.cisco_facility"] == "SYS"
    assert row[".cisco.severity_num"] == 5
    assert row[".cisco.cisco_mnemonic"] == "CONFIG_I"


def test_postgresql_csvlog(spark):
    line = '2026-01-01 10:00:00 UTC,alice,appdb,4242,"10.0.0.1:5432",abc123,7,SELECT'
    row = postgresql_csvlog_parser(_df(spark, [line])).collect()[0]
    assert row.pg_user == "alice"
    assert row.pg_pid == 4242
    assert row.pg_conn == "10.0.0.1:5432"
    assert row.pg_cmd == "SELECT"
