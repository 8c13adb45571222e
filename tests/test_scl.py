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
    line = (
        '2026-01-01 10:00:00.123 UTC,alice,appdb,4242,"10.0.0.1:5432",'
        'abc123,7,SELECT,2026-01-01 09:00:00 UTC,23/74060,0,LOG,00000,'
        '"dur: 1 ms",,,,,,,,,"psql","client backend",,17'
    )
    row = postgresql_csvlog_parser(_df(spark, [line])).collect()[0]
    assert row[".pgsql.username"] == "alice"
    assert row[".pgsql.pid"] == 4242 and row["pid"] == 4242
    assert row[".pgsql.connection_from"] == "10.0.0.1:5432"
    assert row[".pgsql.command_tag"] == "SELECT"
    assert row[".pgsql.application_name"] == "psql"
    assert row[".pgsql.query_id"] == 17
    assert row["msg"] == "dur: 1 ms"
    assert str(row["pgsql_ts"]) == "2026-01-01 10:00:00.123000"


def test_postgresql_csvlog_light_cases(spark):
    """Cases from tests/light/.../test_postgresql_csvlog_parser.py where
    the reference expectations are self-consistent (its case 1 claims
    severity LOG for a DEBUG3 input — a copy-paste artifact; pgsql.conf
    is the authority followed here). Mapping per the conf's shifted
    set-severity chain: DEBUG*→debug, WARNING→notice, PANIC→crit,
    LOG/FATAL unmapped → the generator default (info)."""
    base = (
        '2023-08-08 12:05:52.805 UTC,,,22113,,64d22fa0.5661,1,,'
        '2023-08-08 12:05:52 UTC,23/74060,0,{sev},00000,'
        '"automatic vacuum of table ""tablename"": index scans: 0",,,,,,,,,""'
    )
    for sev, want in [
        ("DEBUG3", 7), ("LOG", 6), ("INFO", 6), ("NOTICE", 5),
        ("WARNING", 5), ("ERROR", 4), ("FATAL", 6), ("PANIC", 2),
    ]:
        row = postgresql_csvlog_parser(
            _df(spark, [base.format(sev=sev)])
        ).collect()[0]
        assert row["severity_num"] == want, (sev, row["severity_num"])
        assert row[".pgsql.severity"] == sev
        # '""' inside the quoted message is an escaped quote
        assert 'table "tablename"' in row["msg"]
        assert row[".pgsql.pid"] == 22113
        assert row[".pgsql.session_line_num"] == 1
        assert row[".pgsql.transaction_id"] == 0


def test_postgresql_csvlog_fewer_fields_and_host_default(spark):
    # v12-era logs carry fewer trailing columns: they null-fill
    line = (
        '2023-08-08 12:05:52.805 UTC,,,22113,,64d22fa0.5661,1,,'
        '2023-08-08 12:05:52 UTC,23/74060,0,LOG,00000,'
    )
    row = postgresql_csvlog_parser(
        _df(spark, [line]), host_from="localhost"
    ).collect()[0]
    assert row[".pgsql.backend_type"] is None
    assert row[".pgsql.connection_from"] == "localhost"  # empty → HOST_FROM
    assert row["severity_num"] == 6


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
         ("17: %SYS-5-CONFIG_I: Configured from console",),
         ('[x@1 a="b"]',),
         ("nothing to see",)],
        "text string",
    )
    got = [r.app for r in app_parser(df).collect()]
    assert got == ["apache", "cisco", "rfc5424-sd", None]


def test_sudo_parser(spark):
    """scl/sudo/sudo.conf: ';'-separated kv with stray-word SUBJECT;
    COMMAND keeps its arguments; pam rows (no COMMAND) are unmatched."""
    from syslog_ng_spark.operators.scl import sudo_parser

    df = spark.createDataFrame(
        [
            ("alice : TTY=pts/0 ; PWD=/home/alice ; USER=root ; COMMAND=/usr/bin/ls -l /tmp",),
            ("pam_unix(sudo:session): session opened for user root",),
        ],
        "msg string",
    )
    out = sudo_parser(df).collect()
    r = out[0]
    assert r["sudo"][".sudo.COMMAND"] == "/usr/bin/ls -l /tmp"
    assert r["sudo"][".sudo.TTY"] == "pts/0"
    assert r["sudo"][".sudo.USER"] == "root"
    assert r[".sudo.SUBJECT"] == "alice"
    assert r["sudo_matched"] is True
    assert out[1]["sudo_matched"] is False


def test_iptables_parser(spark):
    """scl/iptables/iptables.conf: kv over the netfilter line; flag-only
    tokens (DF/SYN) skipped, empty values kept."""
    from syslog_ng_spark.operators.scl import iptables_parser

    line = ("IN=eth0 OUT= MAC=00:11:22:33:44:55 SRC=192.168.1.2 DST=10.0.0.1 "
            "LEN=60 TTL=64 ID=12345 DF PROTO=TCP SPT=51234 DPT=22 SYN URGP=0")
    out = iptables_parser(
        spark.createDataFrame([(line,), ("unrelated kernel text",)], "msg string")
    ).collect()
    r = out[0]
    assert r["iptables"][".iptables.PROTO"] == "TCP"
    assert r["iptables"][".iptables.DPT"] == "22"
    assert r["iptables"][".iptables.OUT"] == ""
    assert ".iptables.DF" not in r["iptables"]  # flag token, not a pair
    assert r["iptables_matched"] is True
    assert out[1]["iptables_matched"] is False


def test_linux_audit_parser_hexdecode_and_nested_msg(spark):
    """modules/kvformat/linux-audit-parser.c semantics: hex fields decode
    only when even-length hex AND the decoded bytes needed encoding
    (space/quote/control); plain-hex-looking values that decode to fully
    printable text stay raw (the kernel would not have encoded them);
    the nested msg='...' payload lands under .auditd.msg. and the raw
    msg is unset (scl/linux-audit block)."""
    from syslog_ng_spark.operators.scl import linux_audit_parser

    syscall = ("type=SYSCALL msg=audit(1364481363.243:24287): arch=c000003e "
               "syscall=2 success=no exit=-13 a0=7fffd19c5592 ppid=2686 "
               'comm="cat" proctitle=2F62696E2F6C73202D6C name=61626364')
    user_acct = ("type=USER_ACCT msg=audit(1451578636.218:378): pid=5260 uid=0 "
                 "msg='op=PAM:accounting acct=\"root\" exe=\"/usr/sbin/crond\" "
                 "hostname=? terminal=cron res=success'")
    out = linux_audit_parser(
        spark.createDataFrame([(syscall,), (user_acct,)], "msg string")
    ).collect()
    m0 = out[0]["auditd"]
    assert m0[".auditd.proctitle"] == "/bin/ls -l"      # contains space -> decoded
    assert m0[".auditd.name"] == "61626364"             # decodes to 'abcd', all printable -> kept raw
    assert m0[".auditd.a0"] == "7fffd19c5592"           # hex reg but decodes to invalid UTF-8 -> kept raw
    assert m0[".auditd.comm"] == "cat"                  # quoted, not hex
    assert ".auditd.msg" not in m0                      # unset after nested parse
    m1 = out[1]["auditd"]
    assert m1[".auditd.msg.acct"] == "root"
    assert m1[".auditd.msg.res"] == "success"
    assert m1[".auditd.type"] == "USER_ACCT"
    assert ".auditd.msg" not in m1


def test_fortigate_parser(spark):
    """scl/fortigate/fortigate.conf: <PRI> stripped, kv body, stamp from
    date+time, HOST from devname, unmatched without devname."""
    from syslog_ng_spark.operators.scl import fortigate_parser

    line = ('<189>date=2026-03-01 time=10:20:30 devname="FGT60D" '
            'devid="FGT60D4614044725" logid="0100044546" type="event" '
            'subtype="system" level="information" msg="System status"')
    out = fortigate_parser(
        spark.createDataFrame([(line,), ("plain syslog line",)], "text string")
    ).collect()
    r = out[0]
    assert r["fortigate"][".fortigate.type"] == "event"
    assert r["host"] == "FGT60D"
    assert str(r["stamp"]) == "2026-03-01 10:20:30"
    assert r["fortigate_matched"] is True
    assert out[1]["fortigate_matched"] is False


def test_osquery_parser(spark):
    """scl/osquery/plugin.conf: json-parser with .osquery. prefix +
    program-override on parsed rows."""
    from syslog_ng_spark.operators.scl import osquery_parser

    line = ('{"name":"pack_mon_info","hostIdentifier":"host1",'
            '"unixTime":"1579097840","columns":{"pid":"700","version":"4.0.2"},'
            '"action":"added"}')
    out = osquery_parser(
        spark.createDataFrame([(line, "old"), ("not json", "old")], "text string, program string")
    ).collect()
    r = out[0]
    assert r["osquery"][".osquery.name"] == "pack_mon_info"
    assert r["osquery"][".osquery.columns.pid"] == "700"
    assert r["program"] == "osquery"
    assert out[1]["program"] == "old"


def test_cee_parser(spark):
    """scl/cee/adapter.conf: json only behind the @cee: cookie."""
    from syslog_ng_spark.operators.scl import cee_parser

    out = cee_parser(
        spark.createDataFrame(
            [('@cee:{"event":"login","user":"alice"}',), ('{"event":"x"}',)],
            "msg string",
        )
    ).collect()
    assert out[0]["cee"][".cee.event"] == "login"
    assert out[0]["cee_matched"] is True
    assert out[1]["cee_matched"] is False  # no cookie, no parse


def test_ewmm_parser(spark):
    """scl/ewmm/ewmm.conf: @syslog-ng EWMM relay rows json-parse; ._TAGS
    lifts into tags and drops from the map."""
    from syslog_ng_spark.operators.scl import ewmm_parser

    body = '{"MESSAGE":"hello","HOST":"web1","._TAGS":".source.s_net,flagged"}'
    out = ewmm_parser(
        spark.createDataFrame(
            [("@syslog-ng", body), ("nginx", body)],
            "program string, msg string",
        )
    ).collect()
    r = out[0]
    assert r["ewmm"]["MESSAGE"] == "hello"
    assert r["tags"] == [".source.s_net", "flagged"]
    assert "._TAGS" not in r["ewmm"]
    assert out[1]["ewmm_matched"] is False  # wrong program


def test_websense_parser(spark):
    """scl/websense/plugin.conf: TZ code stripped, program injected,
    kv extracted."""
    from syslog_ng_spark.operators.scl import websense_parser

    line = ("Mar  1 14:31:18 EST 10.10.10.10 vendor=Websense product=Security "
            "action=permitted src_host=192.168.1.25")
    out = websense_parser(
        spark.createDataFrame([(line,), ("other line",)], "text string")
    ).collect()
    r = out[0]
    assert r["websense"][".websense.vendor"] == "Websense"
    assert r["websense"][".websense.action"] == "permitted"
    assert r["websense_matched"] is True
    assert out[1]["websense_matched"] is False


def test_checkpoint_parser(spark):
    """scl/checkpoint/plugin.conf syslog branch: space-CSV header then
    ';'-separated 'k:v' pairs (bracketed, quoted values); splunk branch
    ('k|v' joined by '=') as fallback."""
    from syslog_ng_spark.operators.scl import checkpoint_parser

    syslog_line = ('<134>1 2018-03-21T17:25:25Z MDS-72 CheckPoint 13752 - '
                   '[action:"Update"; flags:"150784"; ifdir:"inbound"; '
                   'logid:"160571424"]')
    splunk_line = "time|1557767758=action|Accept=orig|192.168.1.1"
    out = checkpoint_parser(
        spark.createDataFrame([(syslog_line,), (splunk_line,)], "text string")
    ).collect()
    r = out[0]
    assert r["checkpoint"][".checkpoint.action"] == "Update"
    assert r["checkpoint"][".checkpoint.logid"] == "160571424"
    assert r["cp_host"] == "MDS-72"
    assert r["cp_program"] == "CheckPoint"
    assert str(r["cp_stamp"]).startswith("2018-03-21 17:25:25")
    s = out[1]
    assert s["checkpoint"][".checkpoint.action"] == "Accept"
    assert s["checkpoint"][".checkpoint.orig"] == "192.168.1.1"


def test_pihole_ftl_parser(spark):
    """scl/pihole/pihole.conf: '[ts pid] LEVEL: msg' → MESSAGE, stamp,
    Pi-hole program, severity from the level token."""
    from syslog_ng_spark.operators.scl import pihole_ftl_parser

    out = pihole_ftl_parser(
        spark.createDataFrame(
            [
                ("[2026-03-01 10:20:30.123 4527] WARNING: Insufficient permissions",),
                ("[2026-03-01 10:20:31.000 4527] FTL started",),
            ],
            "text string",
        )
    ).collect()
    r = out[0]
    assert r["MESSAGE"] == "Insufficient permissions"
    assert r["program"] == "Pi-hole"
    assert str(r["stamp"]).startswith("2026-03-01 10:20:30")
    assert r["level"] == "warning"
    assert out[1]["MESSAGE"] == "FTL started"
    assert out[1]["level"] is None


def test_default_network_drivers_dispatch(spark):
    """scl/default-network-drivers: one ingest surface, per-app dispatch —
    fortigate (raw kv), cee (cookie json), iptables (kernel kv),
    sudo — each lands in its own app lane; plain syslog falls through."""
    from syslog_ng_spark.operators.scl import default_network_drivers

    rows = [
        ('<189>date=2026-03-01 time=10:20:30 devname="FGT60D" type="event"',),
        ('<13>Mar  1 10:20:30 web1 myapp[7]: @cee:{"event":"login"}',),
        ("<6>Mar  1 10:20:30 gw kernel: IN=eth0 OUT= SRC=1.2.3.4 DST=5.6.7.8 PROTO=TCP DPT=22",),
        ("<85>Mar  1 10:20:30 db1 sudo: alice : TTY=pts/0 ; USER=root ; COMMAND=/bin/ls",),
        ("<13>Mar  1 10:20:30 web1 nginx[8]: plain message",),
    ]
    out = default_network_drivers(
        spark.createDataFrame(rows, "text string")
    ).select("app", "program", "host").collect()
    assert [r.app for r in out] == ["fortigate", "cee", "iptables", "sudo", None]
    # preset channel semantics: the generic syslog re-parse must NOT
    # clobber the preset's host/program — a FortiGate line has no syslog
    # header, so its host comes from devname, not the (failed) header
    assert out[0]["host"] == "FGT60D"
    assert out[2]["host"] == "gw"      # syslog-topic rows keep header host
    assert out[4]["host"] == "web1"


def test_default_network_drivers_websense_host(spark):
    """Websense lines carry a TZ token the strict header regex rejects;
    the preset strips it and injects program 'Websense'. The cascade must
    surface the preset's host+program, not the raw-line re-parse's."""
    from syslog_ng_spark.operators.scl import default_network_drivers

    line = (
        "<159>Mar  1 10:20:30 PST wsgateway vendor=Websense "
        "product=Security action=permitted"
    )
    out = default_network_drivers(
        spark.createDataFrame([(line,)], "text string")
    ).collect()[0]
    assert out["app"] == "websense"
    assert out["program"] == "Websense"


def test_junos_application(spark):
    """scl/junos/plugin.conf: the junos app matches on the SDATA reason
    field being present."""
    from syslog_ng_spark.operators.scl import junos_parser

    rows = [
        ('[junos@2636.1.1.1.2.129 reason="link down" interface="ge-0/0/1"]',),
        ('[other@1 k="v"]',),
    ]
    out = junos_parser(spark.createDataFrame(rows, "text string")).collect()
    assert out[0]["junos_matched"] is True
    assert out[0]["sdata"][".SDATA.junos@2636.1.1.1.2.129.reason"] == "link down"
    assert out[1]["junos_matched"] is False


# ---------------------------------------------------------------------------
# snmptrapd (modules/afsnmp/tests/test_snmptrapd_parser.c ported cases)
# ---------------------------------------------------------------------------


def _snmp(spark, text, **kw):
    from syslog_ng_spark.operators.scl import snmptrapd_parser

    return snmptrapd_parser(
        spark.createDataFrame([(text,)], "text string"), **kw
    ).collect()[0]


def test_snmptrapd_v2_message_with_oids(spark):
    """test_snmptrapd_parser.c test_general_v2_message_with_oids."""
    import datetime

    r = _snmp(
        spark,
        "2017-05-10 12:46:14 web2-kukorica.syslog_ng.balabit "
        "[UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n"
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t"
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1       "
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60        \t "
        'iso.3.6.1.4.1.8072.2.1.3 = ""',
    )
    assert r["snmptrapd_matched"]
    m = r["snmp"]
    assert m[".snmp.hostname"] == "web2-kukorica.syslog_ng.balabit"
    assert m[".snmp.transport_info"] == "UDP: [127.0.0.1]:34257->[127.0.0.1]:162"
    assert m[".snmp.iso.3.6.1.2.1.1.3.0"] == "(875496867) 101 days, 7:56:08.67"
    assert m[".snmp.iso.3.6.1.6.3.1.1.4.1.0"] == "iso.3.6.1.4.1.8072.2.3.0.1"
    assert m[".snmp.iso.3.6.1.4.1.8072.2.3.2.1"] == "60"
    assert m[".snmp.iso.3.6.1.4.1.8072.2.1.3"] == ""
    assert r["stamp"] == datetime.datetime(2017, 5, 10, 12, 46, 14)


def test_snmptrapd_v1_message_with_oids(spark):
    """test_general_v1_message_with_oids: enterprise oid + trap
    type/subtype + uptime from the tab-indented v1 info line."""
    r = _snmp(
        spark,
        "2017-11-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: "
        "iso.3.6.1.4.1.8072.2.3.1\n"
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83\n"
        "iso.3.6.1.4.1.8072.2.1.1 = INTEGER: 123456",
    )
    m = r["snmp"]
    assert m[".snmp.hostname"] == "localhost"
    assert m[".snmp.enterprise_oid"] == "iso.3.6.1.4.1.8072.2.3.1"
    assert m[".snmp.type"] == "Enterprise Specific Trap"
    assert m[".snmp.subtype"] == ".17"
    assert m[".snmp.uptime"] == "18:41:07.83"
    assert m[".snmp.iso.3.6.1.4.1.8072.2.1.1"] == "123456"


def test_snmptrapd_v2_symbolic_names_and_types(spark):
    """test_v2_with_symbolic_names_and_various_types: per-type annotation
    stripping, quoted strings, embedded spaces, NULL literal."""
    r = _snmp(
        spark,
        "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n "
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t"
        "snmpModules.1.1.4.1.0 = OID: netSnmpExampleHeartbeatNotification "
        "netSnmpExampleHeartbeatRate = INTEGER: 60\t"
        "netSnmpExampleString = STRING: \"string innerkey='innervalue'\"\t"
        "org.2.2 = Gauge32: 22\t"
        "org.1.1 = Counter32: 11123123   "
        "org.5.3 = Hex-STRING: A0 BB CC DD EF \t"
        "org.8.8 = NULL\t"
        "dod.7 = IpAddress: 192.168.1.0\t  "
        'org.5.9 = STRING: "@"',
    )
    m = r["snmp"]
    assert m[".snmp.snmpModules.1.1.4.1.0"] == "netSnmpExampleHeartbeatNotification"
    assert m[".snmp.netSnmpExampleHeartbeatRate"] == "60"
    assert m[".snmp.netSnmpExampleString"] == "string innerkey='innervalue'"
    assert m[".snmp.org.2.2"] == "22"
    assert m[".snmp.org.1.1"] == "11123123"
    assert m[".snmp.org.5.3"] == "A0 BB CC DD EF"
    assert m[".snmp.org.8.8"] == "NULL"
    assert m[".snmp.dod.7"] == "192.168.1.0"
    assert m[".snmp.org.5.9"] == "@"


def test_snmptrapd_v1_symbolic_names(spark):
    """test_v1_with_symbolic_names: flexible spacing around the header
    colon and the v1 info fields."""
    r = _snmp(
        spark,
        "2017-05-13 12:18:30  localhost  "
        "[UDP: [127.0.0.1]:58143->[127.0.0.1]:162] : netSnmpExampleNotification \n"
        "\t Warm Start Trap (1) Uptime:  27 days, 2:39:02.34\n "
        "netSnmpExampleInteger = INTEGER: 123456 \t "
        "netSnmpExampleString = STRING: random string",
    )
    m = r["snmp"]
    assert m[".snmp.enterprise_oid"] == "netSnmpExampleNotification"
    assert m[".snmp.type"] == "Warm Start Trap"
    assert m[".snmp.subtype"] == "1"
    assert m[".snmp.uptime"] == "27 days, 2:39:02.34"
    assert m[".snmp.netSnmpExampleInteger"] == "123456"
    assert m[".snmp.netSnmpExampleString"] == "random string"


def test_snmptrapd_generated_message_escaped(spark):
    """test_v2_with_generated_message(_escaped): set-message-macro builds
    "key='value'" pairs with apostrophes backslash-escaped."""
    r = _snmp(
        spark,
        "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n"
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"test 'escaped'\"",
    )
    assert r["MESSAGE"] == (
        "hostname='localhost', "
        "transport_info='UDP: [127.0.0.1]:34257->[127.0.0.1]:162', "
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6='test \\'escaped\\''"
    )


def test_snmptrapd_without_prefix_and_key_normalization(spark):
    """test_v2_without_prefix + test_v2_key_normalization: empty prefix;
    runs of ':' in keys collapse to one '_'."""
    r = _snmp(
        spark,
        "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n"
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = test",
        prefix="",
    )
    assert r["snmp"]["iso.3.6.1.4.1.18372.3.2.1.1.1.6"] == "test"
    r2 = _snmp(
        spark,
        "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n "
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t"
        'NET-SNMP-EXAMPLES-MIB:netSnmpExampleString = STRING: "random fact" \t'
        'NET-SNMP-EXAMPLES-MIB::netSnmpColons = STRING: "Colossus colons" \t'
        'NET-SNMP-EXAMPLES-MIB::::::::::::::::::::::::::Trail = STRING: "Gary Indiana" \t'
        ":NET-SNMP-EXAMPLES::::::::::::::::::::::::::::::MIB: = INTEGER: 1234 \t",
    )
    m = r2["snmp"]
    assert m[".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpExampleString"] == "random fact"
    assert m[".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpColons"] == "Colossus colons"
    assert m[".snmp.NET-SNMP-EXAMPLES-MIB_Trail"] == "Gary Indiana"
    assert m[".snmp._NET-SNMP-EXAMPLES_MIB_"] == "1234"


def test_snmptrapd_v1_without_varbindlist_and_drops(spark):
    """test_general_v1_message_without_varbindlist + the two dropped
    shapes (debug output; varbind list starting with a tab)."""
    r = _snmp(
        spark,
        "2017-05-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: "
        "iso.3.6.1.4.1.8072.2.3.1\n"
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83",
    )
    assert r["snmptrapd_matched"]
    assert r["snmp"][".snmp.uptime"] == "18:41:07.83"

    dropped1 = _snmp(
        spark, "2017-05-19 10:00:00 NET-SNMP version 5.7.3 Stopped.\nStopping snmptrapd"
    )
    assert not dropped1["snmptrapd_matched"] and dropped1["snmp"] is None

    dropped2 = _snmp(
        spark,
        "2017-05-19 13:37:00 localhost [UDP: [127.0.0.1]:36324->[127.0.0.1]:162]:\n"
        "\tiso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t"
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1 \t"
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60",
    )
    assert not dropped2["snmptrapd_matched"]


def test_snmptrapd_v2_message_with_garbage(spark):
    """test_v2_message_with_garbage: the varbind scan stops at the first
    newline (kv stop char) — trailing garbage lines are ignored."""
    r = _snmp(
        spark,
        "2017-05-10 12:46:14 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n"
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t"
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1\n"
        "garbage = stop here",
    )
    m = r["snmp"]
    assert m[".snmp.iso.3.6.1.6.3.1.1.4.1.0"] == "iso.3.6.1.4.1.8072.2.3.0.1"
    assert ".snmp.garbage" not in m


def test_cim_application(spark):
    """scl/cim/adapter.conf: json-parser prefix('.cim.') marker('@cim:')."""
    from syslog_ng_spark.operators.scl import cim_parser

    rows = [('@cim:{"action":"allowed","src_ip":"1.2.3.4"}',), ("not cim",)]
    out = cim_parser(spark.createDataFrame(rows, "text string")).collect()
    assert out[0]["cim"][".cim.action"] == "allowed"
    assert out[0]["cim_matched"] and not out[1]["cim_matched"]


def test_netskope_application(spark):
    """scl/netskope/plugin.conf: strip <PRI>, json under '.netskope.';
    app filter = starts with '<134>{' and contains the insertion epoch."""
    from syslog_ng_spark.operators.scl import netskope_parser

    line = (
        '<134>{"count": 1, "severity_level": 2, "timestamp": 1547421943, '
        '"_insertion_epoch_timestamp": 1547421943, "user": "user@domain.com", '
        '"audit_log_event": "Login Successful", "type": "admin_audit_logs"}'
    )
    rows = [(line,), ('<13>{"other": 1}',)]
    out = netskope_parser(spark.createDataFrame(rows, "text string")).collect()
    assert out[0]["netskope_matched"]
    assert out[0]["netskope"][".netskope.user"] == "user@domain.com"
    assert out[0]["netskope"][".netskope.audit_log_event"] == "Login Successful"
    assert not out[1]["netskope_matched"]


def test_collectd_putval_line(spark):
    """scl/collectd/plugin.conf destination template: PUTVAL identifier
    with optional -instance parts + interval + unixtime:values."""
    import datetime

    from syslog_ng_spark.functions.templates import collectd_putval_line

    df = spark.createDataFrame(
        [("web1", datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc), "42")],
        "host string, ts timestamp, metric string",
    )
    line = df.select(
        collectd_putval_line(
            "cpu", "gauge", plugin_instance="0", values="${metric}"
        ).alias("l")
    ).collect()[0]["l"]
    assert line == "PUTVAL web1/cpu-0/gauge interval=60 1767225600:42"
    bare = df.select(
        collectd_putval_line("load", "load", interval="", values="U").alias("l")
    ).collect()[0]["l"]
    assert bare == "PUTVAL web1/load/load 1767225600:U"


def test_nodejs_winston(spark):
    """scl/nodejs: winston '[meta, payload]' envelope — extract-prefix
    [1], MESSAGE from .nodejs.winston.message which is then unset."""
    from syslog_ng_spark.operators.scl import nodejs_parser

    line = '[{"transport":"tcp"},{"level":"info","message":"user logged in","who":"alice"}]'
    out = nodejs_parser(spark.createDataFrame([(line,), ("junk",)], "text string")).collect()
    r = out[0]
    assert r["nodejs_matched"]
    assert r["MESSAGE"] == "user logged in"
    assert r["nodejs"][".nodejs.winston.who"] == "alice"
    assert ".nodejs.winston.message" not in r["nodejs"]
    assert not out[1]["nodejs_matched"]


def test_mbox_source(spark):
    """scl/mbox: records start at '^From ' separator lines."""
    import datetime

    from syslog_ng_spark.operators.scl import mbox_lines

    ts = datetime.datetime(2026, 1, 1)
    lines = [
        "From alice@example.com Mon Jan  1 10:00:00 2026",
        "Subject: hi",
        "",
        "first body",
        "From bob@example.com Mon Jan  1 11:00:00 2026",
        "Subject: yo",
        "second body",
    ]
    df = spark.createDataFrame(
        [("m", i, t, ts) for i, t in enumerate(lines)],
        "conv_id string, turn_idx int, text string, ts timestamp",
    )
    out = mbox_lines(df, key=["conv_id"]).orderBy("turn_idx").collect()
    assert len(out) == 2
    assert out[0].text.startswith("From alice@") and "first body" in out[0].text
    assert out[1].text.startswith("From bob@") and out[1].n_lines == 3


def test_jellyfin_parser(spark):
    from syslog_ng_spark.operators.scl import jellyfin_parser

    line = "[2026-03-01 10:20:30.123 +00:00] [ERR] [17] Main: something broke"
    out = jellyfin_parser(spark.createDataFrame([(line,), ("noise",)], "text string")).collect()
    r = out[0]
    assert r["jellyfin_matched"]
    assert r["MESSAGE"] == "Main: something broke"
    assert r["program"] == "Jellyfin"
    assert r["level"] == "err"
    assert r["stamp"] is not None
    assert not out[1]["jellyfin_matched"]


def test_qbittorrent_parser(spark):
    from syslog_ng_spark.operators.scl import qbittorrent_parser

    out = qbittorrent_parser(
        spark.createDataFrame(
            [("(W) 2026-03-01T10:20:30 - disk is slow",)], "text string"
        )
    ).collect()[0]
    assert out["qbt_matched"]
    assert out["MESSAGE"] == "disk is slow"
    assert out["program"] == "qBittorrent"
    assert out["level"] == "warning"
    import datetime

    assert out["stamp"] == datetime.datetime(2026, 3, 1, 10, 20, 30)


def test_arr_parser(spark):
    from syslog_ng_spark.operators.scl import arr_parser

    line = "2026-03-01 10:20:30.1|Warn|DownloadService|stalled download"
    out = arr_parser(
        spark.createDataFrame([(line,)], "text string"),
        program="radarr", prefix=".radarr.",
    ).collect()[0]
    assert out["arr_matched"]
    assert out["MESSAGE"] == "stalled download"
    assert out["program"] == "radarr"
    assert out[".radarr.module"] == "DownloadService"
    assert out["level"] == "warn"


def test_app_parser_registry_port(spark):
    """Port of modules/appmodel/tests/test_app_parser_generator.c
    semantics: first-match dispatch in registration order,
    include/exclude filtering, auto-parse(no) and unknown topics
    generate empty framing (rows pass, app NULL)."""
    from syslog_ng_spark.operators.scl import app_parser, register_application

    df = spark.createDataFrame(
        [
            ('1.2.3.4 - u [12/Jan/2024:00:00:00 +0000] "GET / HTTP/1.0" 200 5',),
            # the reference's own light cisco line: the ': %' structure
            # is REQUIRED (application cisco[syslog-raw] filters on it)
            ("<189>29: foo: *Apr 29 13:58:40.411: %SYS-5-CONFIG_I: "
             "Configured from console by console",),
            ("plain message",),
        ],
        "text string",
    )
    got = [r["app"] for r in app_parser(df).collect()]
    assert got[0] == "apache"
    assert got[1] == "cisco"
    assert got[2] is None

    # include/exclude filter the generated dispatch; exclude wins
    got = [r["app"] for r in app_parser(df, include_apps=["cisco"]).collect()]
    assert got == [None, "cisco", None]
    got = [r["app"] for r in app_parser(df, exclude_apps=["cisco"]).collect()]
    assert got[1] is None

    # auto-parse(no) and no-apps-registered topics => empty framing
    for kw in ({"auto_parse": False}, {"topic": "no_such_topic"}):
        out = app_parser(df, **kw)
        assert out.count() == 3
        assert all(r["app"] is None for r in out.collect())

    # registering under a new topic dispatches there only
    from syslog_ng_spark.operators.scl import cisco_parser

    register_application("cisco2", cisco_parser, "cisco_matched",
                         topic="netdev")
    got = [r["app"] for r in app_parser(df, topic="netdev").collect()]
    assert got == [None, "cisco2", None]


def test_panos_light_cases(spark):
    """The four light-suite panos cases
    (tests/light/functional_tests/parsers/panos/test_panos_parser.py),
    message part only (the engine's app-parser handles the syslog
    head): SYSTEM, SYSTEM with accepted trailing extras, CONFIG
    standard (exactly 15 tail fields, drop-invalid path), CONFIG custom
    (before/after_change_detail present)."""
    from syslog_ng_spark.operators.scl import panos_parser

    sys_msg = (
        "1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,"
        ",auth-fail,,0,0,general,medium,failed authentication for user "
        "'admin'. Reason: Invalid username/password. From: 10.0.10.55.,"
        "1718,0x0,0,0,0,0,,paloalto"
    )
    cfg_msg = (
        "1,2020/04/14 16:54:18,unknown,CONFIG,0,0,2020/04/14 16:54:18,"
        "10.0.10.55,,set,admin,Web,Succeeded,deviceconfig system,127,0x0,"
        "0,0,0,0,,paloalto"
    )
    cfg_custom = (
        "1,2020/04/14 16:54:18,unknown,CONFIG,0,0,2020/04/14 16:54:18,"
        "10.0.10.55,,set,admin,Web,Succeeded,deviceconfig system,before,"
        "after,127,0x0,0,0,0,0,,paloalto"
    )
    rows = panos_parser(
        spark.createDataFrame(
            [(1, sys_msg), (2, sys_msg + ",foo,bar"), (3, cfg_msg),
             (4, cfg_custom), (5, "1,2020/04/14,unknown,BOGUS,x,0,t,a,b")],
            "i long, text string",
        )
    ).orderBy("i").collect()

    r1, r2, r3, r4, r5 = rows
    for r in (r1, r2):  # SYSTEM; trailing extras accepted
        assert r[".panos.matched"]
        assert r["program"] == "paloalto_panos"
        assert r[".panos.type"] == "SYSTEM"
        assert r[".panos.eventid"] == "auth-fail"
        assert r[".panos.device_name"] == "paloalto"
    assert r3[".panos.matched"]
    assert r3[".panos.path"] == "deviceconfig system"
    assert r3[".panos.device_name"] == "paloalto"
    assert r3[".panos.before_change_detail"] is None
    assert r4[".panos.matched"]  # custom layout: 17 tail fields
    assert r4[".panos.path"] == "deviceconfig system"
    assert r4[".panos.before_change_detail"] == "before"
    assert r4[".panos.after_change_detail"] == "after"
    assert r4[".panos.device_name"] == "paloalto"
    assert not r5[".panos.matched"]  # unknown type → the no-else drop
    assert r5["program"] is None


def test_panos_branch_columns(spark):
    """TRAFFIC/THREAT/HIP-MATCH/CORRELATION/USERID branch column
    positions: device_name lands where the reference list puts it and
    the required-non-empty filter gates matched."""
    from syslog_ng_spark.operators.scl import (
        _PANOS_BRANCHES,
        panos_parser,
    )

    rows, want = [], {}
    for i, (t, names) in enumerate(sorted(_PANOS_BRANCHES.items())):
        tail = [f"v{j}" for j in range(len(names))]
        tail[names.index("device_name")] = f"dev-{t}"
        rows.append((i, f"1,rt,serial,{t},sub,0,gen," + ",".join(tail)))
        want[i] = (t, f"dev-{t}")
        # same branch with EMPTY device_name → unmatched
        tail2 = list(tail)
        tail2[names.index("device_name")] = ""
        rows.append((100 + i, f"1,rt,serial,{t},sub,0,gen," + ",".join(tail2)))
    got = {
        r["i"]: r
        for r in panos_parser(
            spark.createDataFrame(rows, "i long, text string")
        ).collect()
    }
    for i, (t, dev) in want.items():
        assert got[i][".panos.matched"], t
        assert got[i][".panos.device_name"] == dev
        assert not got[100 + i][".panos.matched"], t


def test_app_parser_dispatches_panos(spark):
    from syslog_ng_spark.operators.scl import app_parser

    line = (
        "1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,"
        ",auth-fail,,0,0,general,medium,failed auth,1718,0x0,0,0,0,0,,paloalto"
    )
    df = spark.createDataFrame([(line,), ("nothing to see",)], "text string")
    got = [r.app for r in app_parser(df).collect()]
    assert got == ["panos", None]


def test_cisco_light_cases(spark):
    """Reference light-suite cisco lines (tests/light/functional_tests/
    parsers/cisco-parser/test_cisco_parser.py + plugin.conf samples):
    std/ISO/NXOS timestamps, trailing-host forms, RP/CLC cpu_module,
    4-token SYSMGR-STANDBY triplet, seqno and NXOS ': ' stripping."""
    from syslog_ng_spark.operators.scl import cisco_parser

    LINES = {
        1: "<189>29: foo: *Apr 29 13:58:40.411: %SYS-5-CONFIG_I: Configured from console by console",
        2: "<190>30: foo: *Apr 29 13:58:46.411: %SYS-6-LOGGINGHOST_STARTSTOP: Logging to host 192.168.1.239 stopped - CLI initiated",
        3: "<190>32: foo: *Apr 29 13:58:46.411: %SYSMGR-STANDBY-3-SHUTDOWN_START: The System Manager has started the shutdown procedure.",
        4: "<166>2022-02-16T15:31:53Z na-zy-int-fp1140-p02 : %FTD-6-305012: Teardown dynamic TCP translation",
        5: "<164>Aug 08 16:58:18 DEVICE123 : %FTD-4-106023: test cisco asa",
        6: "<187>138076: RP/0/RP0/CPU0:Dec 11 12:43:29.227 EST: snmpd[1002]: %SNMP-SNMP-3-AUTH_FAIL : Received snmp request on unknown community",
        7: "<187>: 2025 Jun 25 11:27:28 GMT: %AUTHPRIV-3-SYSTEM_MSG: pam_aaa:Authentication failed from 192.168.1.10",
        8: "no cisco content here",
        # Cisco space-pads single-digit days: 'MMM  d' (double space)
        9: "<189>31: foo: *Mar  1 18:46:11.299: %SYS-5-CONFIG_I: Configured from console by vty0",
        10: "<164>Aug  8 16:58:18 DEVICE123 : %FTD-4-106023: padded day asa",
    }
    rows = {
        r["i"]: r
        for r in cisco_parser(
            spark.createDataFrame(
                [(k, v) for k, v in LINES.items()], "i long, text string"
            )
        ).collect()
    }
    r = rows[1]
    assert r["cisco_matched"] and r["cisco_pri"] == 189
    assert r["cisco_host"] == "foo"
    assert r[".cisco.facility"] == "SYS"
    assert r[".cisco.severity"] == "5"
    assert r[".cisco.mnemonic"] == "CONFIG_I"
    assert r["cisco_msg"] == "%SYS-5-CONFIG_I: Configured from console by console"
    assert str(r["cisco_ts"]).endswith("04-29 13:58:40.411000")
    assert rows[2][".cisco.mnemonic"] == "LOGGINGHOST_STARTSTOP"
    # 4-token triplet: facility keeps the embedded dash
    assert rows[3][".cisco.facility"] == "SYSMGR-STANDBY"
    assert rows[3][".cisco.severity"] == "3"
    assert rows[3][".cisco.mnemonic"] == "SHUTDOWN_START"
    # ISO timestamp + trailing host
    assert rows[4]["cisco_matched"]
    assert rows[4]["cisco_host"] == "na-zy-int-fp1140-p02"
    assert str(rows[4]["cisco_ts"]).startswith("2022-02-16 15:31:53")
    # std timestamp + trailing host
    assert rows[5]["cisco_host"] == "DEVICE123"
    assert rows[5][".cisco.facility"] == "FTD"
    # RP cpu_module
    assert rows[6]["cisco_matched"]
    assert rows[6][".cisco.cpu_module"] == "RP/0/RP0/CPU0"
    assert rows[6][".cisco.facility"] == "SNMP-SNMP"
    assert str(rows[6]["cisco_ts"]).endswith("12-11 12:43:29.227000")
    # NXOS 9.3: '<pri>: ' head, year-first timestamp, no host
    assert rows[7]["cisco_matched"]
    assert rows[7]["cisco_host"] is None
    assert str(rows[7]["cisco_ts"]) == "2025-06-25 11:27:28"
    assert rows[7][".cisco.facility"] == "AUTHPRIV"
    assert not rows[8]["cisco_matched"]
    # space-padded single-digit day still parses (strptime '%b %d' does;
    # Java 'MMM d' needs the space-run collapse)
    assert rows[9]["cisco_matched"]
    assert str(rows[9]["cisco_ts"]).endswith("03-01 18:46:11.299000")
    assert rows[10]["cisco_matched"]
    assert str(rows[10]["cisco_ts"]).endswith("08-08 16:58:18")
    assert rows[10]["cisco_host"] == "DEVICE123"


def test_app_parser_raw_topic_light_cases(spark):
    """Dispatch expectations from tests/light/functional_tests/parsers/
    app-parser/test_topic_syslog_raw.py: cisco / panos / netskope /
    websense / checkpoint (3164-date, ISO and kv-pipe shapes) /
    fortigate lines each land on their application."""
    from syslog_ng_spark.operators.scl import app_parser

    CASES = [
        ("<189>29: foo: *Apr 29 13:58:40.411: %SYS-5-CONFIG_I: Configured from console by console", "cisco"),
        ("<12>Apr 14 16:48:54 paloalto.test.net 1,2020/04/14 16:48:54,unknown,SYSTEM,auth,0,2020/04/14 16:48:54,,auth-fail,,0,0,general,medium,failed auth,1718,0x0,0,0,0,0,,paloalto", "panos"),
        ('<134>{"count": 1, "supporting_data": {"data_type": "user"}, "timestamp": 1547421943, "_insertion_epoch_timestamp": 1547421943, "user": "user@domain.com", "type": "admin_audit_logs"}', "netskope"),
        ("<159>Dec 19 10:48:57 EST 10.203.28.21 vendor=Websense product=Security product_version=7.7.0 action=permitted severity=1 category=153 user=- src_host=10.64.134.74", "websense"),
        ('<134>1 2018-03-21 17:25:25 MDS-72 CheckPoint 13752 - [action:"Update"; flags:"150784"; ifdir:"inbound"; origin:"192.168.32.91"; product:"Identity Awareness";]', "checkpoint"),
        ('<134>1 2019-11-27T02:58:25Z ABDP-CPLOG01 CheckPoint 22103 - [action:"Accept"; flags:"18692"; ifdir:"inbound"; origin:"10.4.150.2"; product:"VPN-1 & FireWall-1";]', "checkpoint"),
        ('time=1557767758|hostname=r80test|product=Firewall|action=Accept|ifdir=inbound|origin=192.168.96.80|dst=192.168.96.80|proto=6|src=192.168.96.27|', "checkpoint"),
        ('<189>date=2021-01-15 time=12:58:59 devname="FORTI_111" devid="FG100D3G12801312" logid="0001000014" type="traffic" level="notice" srcip=91.234.154.139 action="deny"', "fortigate"),
        ("plain message with nothing special", None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i long, text string"
    )
    got = {r["i"]: r["app"] for r in app_parser(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)
