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


def test_mariadb_audit_parser(spark):
    from syslog_ng_spark.operators.scl import mariadb_audit_parser

    df = spark.createDataFrame(
        [("docker eff8a68bcd7f,root,172.18.0.3,13,0,CONNECT,,,0",),
         ("columnstore-1 centos,root,localhost,11,117,QUERY,loans,'SELECT 1',0",)],
        "text string",
    )
    rows = mariadb_audit_parser(df).collect()
    r0 = next(r for r in rows if r["`.mariadb.operation`"] == "CONNECT") if False else rows[0]
    got = {r[".mariadb.operation"]: r for r in rows}
    assert got["CONNECT"][".mariadb.serverhost"] == "eff8a68bcd7f"
    assert got["CONNECT"][".mariadb.syslog_info"] == "docker"
    assert got["CONNECT"][".mariadb.username"] == "root"
    assert got["QUERY"][".mariadb.object"] == "SELECT 1"
    assert got["QUERY"][".mariadb.retcode"] == "0"


def test_panos_parser(spark):
    from syslog_ng_spark.operators.scl import panos_parser

    line = ("1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,"
            ",auth-fail,,0,0,general,medium,failed auth,1718,0x0,0,0,0,0,,paloalto")
    df = spark.createDataFrame([(line,)], "text string")
    r = panos_parser(df).collect()[0]
    assert r[".panos.type"] == "SYSTEM"
    assert r[".panos.eventid"] == "auth-fail"
    assert r[".panos.severity"] == "medium"
    assert r[".panos.matched"]


def test_sdata_parser(spark):
    from syslog_ng_spark.operators.scl import sdata_parser

    df = spark.createDataFrame(
        [('[exampleSDID@32473 iut="3" eventSource="App"][other@1 k="a\\"b"]',),
         ("plain text",)],
        "text string",
    )
    rows = sdata_parser(df).collect()
    sd = rows[0].sdata
    assert sd[".SDATA.exampleSDID@32473.iut"] == "3"
    assert sd[".SDATA.exampleSDID@32473.eventSource"] == "App"
    assert sd[".SDATA.other@1.k"] == 'a"b'
    assert rows[1].sdata is None


def test_windows_eventlog_parser(spark):
    from syslog_ng_spark.operators.scl import windows_eventlog_parser

    xml = (
        "<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>"
        "<System><EventID>4624</EventID><Channel>Security</Channel></System>"
        "<EventData><Data Name='TargetUserName'>alice</Data>"
        "<Data Name='LogonType'>2</Data></EventData></Event>"
    )
    df = spark.createDataFrame([(xml,)], "text string")
    m = windows_eventlog_parser(df).collect()[0].winlog
    assert m[".windows.Event.System.EventID"] == "4624"
    assert m[".windows.Event.EventData.Data.TargetUserName"] == "alice"
    assert m[".windows.Event.EventData.Data.LogonType"] == "2"


def test_app_parser_dispatch(spark):
    from syslog_ng_spark.operators.scl import app_parser

    df = spark.createDataFrame(
        [('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326',),
         ("%SYS-5-CONFIG_I: Configured from console",),
         ('[x@1 a="b"]',),
         ("nothing to see",)],
        "text string",
    )
    got = [r.app for r in app_parser(df).collect()]
    assert got == ["apache", "cisco", "rfc5424-sd", None]
