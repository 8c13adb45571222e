"""lib/tests/test_msgparse.c ported as a table-driven suite.

The C table runs under TZ=MET with a fake wall clock of Fri Feb 8 2019;
here the session TZ is UTC, so expectations are expressed as:
- ``utc``: the exact UTC instant (datetime) for inputs carrying an
  explicit offset (equivalent to the C epoch expectations);
- ``wall``: the literal wall-clock datetime for offset-less inputs
  (the C expectations for those bake in MET; the invariant is the
  parsed wall time, with the year from the engine's year hint = 2019
  mirroring the fake clock).

Documented divergences (not ported):
- messages with NO timestamp get syslog_ts NULL here (the reference
  stamps receive time; a batch engine has no receive clock — callers
  coalesce onto their event-time column);
- LP_PIGGYBACK_ERRORS / LP_NO_RFC3164_FALLBACK error-path rewriting and
  LP_SANITIZE_UTF8 are out of scope (parquet strings are UTF-8 by
  construction; see TODO.md);
- the engine does not synthesize .SDATA.timeQuality.* (receive-time
  metadata, not message content).
"""

import datetime

import pytest

from pyspark.sql import functions as F

from syslog_ng_spark.operators import parsers


def utc(sec, usec=0):
    return datetime.datetime.fromtimestamp(
        sec, datetime.timezone.utc
    ).replace(tzinfo=None) + datetime.timedelta(microseconds=usec)


W = datetime.datetime  # wall-clock literal

# (cfg, msg, expected dict). cfg: default | nohost | bad:<re>
CASES = [
    # --- test_timestamp -----------------------------------------------------
    ("default", "<15> openvpn[2499]: PTHREAD support initialized",
     dict(pri=15, ts=None, host=None, program="openvpn", pid=2499,
          msg="PTHREAD support initialized")),
    ("default", "<15>Jan  1 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=15, ts=W(2019, 1, 1, 1, 0, 0), host="bzorp", program="openvpn",
          pid=2499, msg="PTHREAD support initialized")),
    ("default", "<15>Jan 10 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=15, ts=W(2019, 1, 10, 1, 0, 0), host="bzorp", program="openvpn",
          pid=2499, msg="PTHREAD support initialized")),
    ("nohost", "<13>Jan  1 14:40:51 alma korte: message",
     dict(pri=13, ts=W(2019, 1, 1, 14, 40, 51), host=None, program="alma",
          msg="korte: message")),
    ("default", "<7>2006-11-10T10:43:21.156+02:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=7, ts=utc(1163148201, 156000), host="bzorp", program="openvpn",
          pid=2499, msg="PTHREAD support initialized")),
    ("default", "<7>2006-11-10T10:43:21.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=7, ts=utc(1163151801, 156000))),
    # 60-digit fraction truncates to microseconds
    ("default", "<7>2006-11-10T10:43:21.15600000000000000000000000000000000000000000000000000000000000+01:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=7, ts=utc(1163151801, 156000), program="openvpn")),
    # DST-boundary instants with explicit offsets
    ("default", "<7>2006-03-26T01:59:59.156+01:00 bzorp openvpn[2499]: x",
     dict(ts=utc(1143334799, 156000))),
    ("default", "<7>2006-03-26T02:00:00.156+01:00 bzorp openvpn[2499]: x",
     dict(ts=utc(1143334800, 156000))),
    ("default", "<7>2006-10-29T01:59:59.156+02:00 bzorp openvpn[2499]: x",
     dict(ts=utc(1162079999, 156000))),
    # 5424 NIL timestamp → null here (receive-time divergence, see above)
    ("default", "<7>1 - bzorp openvpn 2499 - - PTHREAD support initialized",
     dict(pri=7, ts=None, host="bzorp", program="openvpn", pid=2499,
          msg="PTHREAD support initialized")),
    # --- test_foreign_timezone ---------------------------------------------
    ("default", "<7>2006-10-29T01:00:00.156+01:00 bzorp openvpn[2499]: x",
     dict(ts=utc(1162080000, 156000))),
    # --- test_hostname ------------------------------------------------------
    ("default", "<7>2006-10-29T02:00:00.156+01:00 %bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=7, host=None, program="%bzorp",
          msg="openvpn[2499]: PTHREAD support initialized")),
    ("default", "<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(host="bzorp", program="openvpn", pid=2499,
          msg="PTHREAD support initialized")),
    # --- test_timestamp_others ----------------------------------------------
    ("nohost", "<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized",
     dict(pri=7, ts=utc(1162083600, 156000), host=None, program="bzorp",
          msg="openvpn[2499]: PTHREAD support initialized")),
    ("default", "<7>2006-10-29T02:00:00.156+01:00 ",
     dict(pri=7, ts=utc(1162083600, 156000), host=None, program=None, msg="")),
    ("default", "<7>2006-10-29T02:00:00.156+01:00",
     dict(pri=7, ts=utc(1162083600, 156000), host=None, program=None, msg="")),
    # ISO timestamp missing the 'T'
    ("default", "<7>2006-10-29 02:00:00.156+01:00",
     dict(pri=7, ts=utc(1162083600, 156000))),
    # bad_hostname: the matching token is the PROGRAM, not the host
    ("bad:^ctld", "<7>2006-10-29T02:00:00.156+01:00 ctld snmpd[2499]: PTHREAD support initialized",
     dict(pri=7, ts=utc(1162083600, 156000), host=None, program="ctld",
          msg="snmpd[2499]: PTHREAD support initialized")),
    ("bad:^ctld", "<7> Aug 29 02:00:00.156 ctld snmpd[2499]: PTHREAD support initialized",
     dict(pri=7, ts=W(2019, 8, 29, 2, 0, 0, 156000), host=None,
          program="ctld", msg="snmpd[2499]: PTHREAD support initialized")),
    ("bad:^ctld", "<7> Aug 29 02:00:00.156789 ctld snmpd[2499]: x",
     dict(ts=W(2019, 8, 29, 2, 0, 0, 156789))),
    ("bad:^ctld", "<7> Aug 29 02:00:00. ctld snmpd[2499]: x",
     dict(ts=W(2019, 8, 29, 2, 0, 0))),
    ("bad:^ctld", "<7> Aug 29 02:00:00 ctld snmpd[2499]: x",
     dict(ts=W(2019, 8, 29, 2, 0, 0))),
    ("default", "<7>Aug 29 02:00:00 bzorp ctld/snmpd[2499]: PTHREAD support initialized",
     dict(host="bzorp", program="ctld/snmpd", pid=2499,
          msg="PTHREAD support initialized")),
    # PIX: year inside the BSD date + trailing ':' after the time
    ("bad:^%", "<190>Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP connection 1688438 for bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 duration 0:07:01 bytes 16975 TCP FINs",
     dict(pri=190, ts=W(2007, 4, 15, 21, 28, 13), host=None,
          program="%PIX-6-302014",
          msg="Teardown TCP connection 1688438 for bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 duration 0:07:01 bytes 16975 TCP FINs")),
    # Dell switch: uppercase month
    ("default", "<190>NOV 22 00:00:33 192.168.33.8-1 CMDLOGGER[165319912]: cmd_logger_api.c(83) 13518 %% CLI:192.168.32.100:root:User  logged in",
     dict(pri=190, ts=W(2019, 11, 22, 0, 0, 33), host="192.168.33.8-1",
          program="CMDLOGGER",
          msg="cmd_logger_api.c(83) 13518 %% CLI:192.168.32.100:root:User  logged in")),
    # --- test_expected_sd_pairs_0 -------------------------------------------
    ("bad:^%", "<190>.Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP",
     dict(pri=190, ts=W(2007, 4, 15, 21, 28, 13), program="%PIX-6-302014",
          msg="Teardown TCP")),
    ("bad:^%", "<190>Apr 15 2007 21:28:13 %ASA: this is a Cisco ASA timestamp",
     dict(pri=190, program="%ASA", msg="this is a Cisco ASA timestamp")),
    # linksys: year AFTER the time
    ("default", "<190>Apr 15 21:28:13 2007 linksys app: msg",
     dict(pri=190, ts=W(2007, 4, 15, 21, 28, 13), host="linksys",
          program="app", msg="msg")),
    # AIX 'Message forwarded from HOST:' relay prefix
    ("default", "<38>Sep 22 10:11:56 Message forwarded from cdaix66: sshd[679960]: Accepted publickey for nagios from 1.9.1.1 port 42096 ssh2",
     dict(pri=38, host="cdaix66", program="sshd",
          msg="Accepted publickey for nagios from 1.9.1.1 port 42096 ssh2")),
    # --- test_expected_sd_pairs_1 (5424 SDATA + BOM strip) ------------------
    ("default", '<7>1 2006-10-29T01:59:59.156+01:00 mymachine.example.com evntslog - ID47 [exampleSDID@0 iut="3" eventSource="Application" eventID="1011"][examplePriority@0 class="high"] ﻿An application event log entry...',
     dict(pri=7, ts=utc(1162083599, 156000), host="mymachine.example.com",
          program="evntslog", msgid="ID47",
          msg="An application event log entry...",
          sdata={".SDATA.exampleSDID@0.iut": "3",
                 ".SDATA.exampleSDID@0.eventSource": "Application",
                 ".SDATA.exampleSDID@0.eventID": "1011",
                 ".SDATA.examplePriority@0.class": "high"})),
    ("default", '<7>1 2006-10-29T01:59:59.156123Z mymachine.example.com evntslog - ID47 [exampleSDID@0 iut="3"] ﻿An application event log entry...',
     dict(ts=utc(1162087199, 156123),
          sdata={".SDATA.exampleSDID@0.iut": "3"})),
    ("default", "<34>1 1987-01-01T12:00:27.000087+00:20 192.0.2.1 myproc 8710 - - %% It's time to make the do-nuts.",
     dict(pri=34, ts=utc(536499627, 87), host="192.0.2.1", program="myproc",
          pid=8710, msg="%% It's time to make the do-nuts.")),
    # --- test_expected_sd_pairs_2: space-separated 2nd bracket is MSG -------
    ("default", '<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - [exampleSDID@0 iut="3"] [eventSource="Application" eventID="1011"][examplePriority@0 class="high"] An application event log entry...',
     dict(pri=132, host="mymachine", program="evntslog",
          msg='[eventSource="Application" eventID="1011"][examplePriority@0 class="high"] An application event log entry...',
          sdata={".SDATA.exampleSDID@0.iut": "3"})),
    ("default", "<7>Aug 29 02:00:00 bzorp ctld/snmpd[2499]:",
     dict(host="bzorp", program="ctld/snmpd", pid=2499, msg="")),
    # --- test_expected_sd_pairs_3: escaped quotes in SD values --------------
    ("default", '<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg MSExchange_ADAccess 20208 - [origin ip="exchange.macartney.esbjerg"][meta sequenceId="191732" sysUpTime="68807696"][EventData@18372.4 Data="MSEXCHANGEOWAAPPPOOL.CONFIG\\" -W \\"\\" -M 1 -AP \\"MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 "][Keywords@18372.4 Keyword="Classic"] ApplicationMSExchangeADAccess: message',
     dict(pri=134, ts=utc(1255686716), host="exchange.macartney.esbjerg",
          program="MSExchange_ADAccess", pid=20208,
          msg="ApplicationMSExchangeADAccess: message",
          sdata={".SDATA.origin.ip": "exchange.macartney.esbjerg",
                 ".SDATA.meta.sequenceId": "191732",
                 ".SDATA.EventData@18372.4.Data": 'MSEXCHANGEOWAAPPPOOL.CONFIG" -W "" -M 1 -AP "MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 '})),
    # --- test_ip_in_host ----------------------------------------------------
    ("default", "<0>Jan 10 01:00:00 1.2.3.4 prg0",
     dict(pri=0, ts=W(2019, 1, 10, 1, 0, 0), host="1.2.3.4", program="prg0")),
    ("default", "<0>Jan 10 01:00:00 0000:BABA:BA00:DAB:BABA:BABA:BABA:BAB0 prg0",
     dict(host="0000:BABA:BA00:DAB:BABA:BABA:BABA:BAB0", program="prg0")),
    ("default", "<0>Jan 10 01:00:00 0001:BABA:BA00:DAB::BAB0 prg0",
     dict(host="0001:BABA:BA00:DAB::BAB0", program="prg0")),
    ("default", "<0>Jan 10 01:00:00 0002:: prg0: msgtxt",
     dict(host="0002::", program="prg0", msg="msgtxt")),
    ("default", "<0>Jan 10 01:00:00 prg0",
     dict(host=None, program="prg0")),
    ("nohost", "<0>Jan 10 01:00:00 prg0: msgtxt",
     dict(host=None, program="prg0", msg="msgtxt")),
    # Cisco: seq id + '*' unsynced-clock marker + bad_hostname '%' program
    ("default", "<0>91: *Oct 07 03:10:04: mydevice.com %CRYPTO-4-RECVD_PKT_INV_SPI: decaps: rec'd IPSEC packet has invalid spi for destaddr=150.1.1.1, prot=50, spi=0x72662541(1919296833), srcaddr=150.3.1.3",
     dict(pri=0, ts=W(2019, 10, 7, 3, 10, 4), host="mydevice.com",
          program="%CRYPTO-4-RECVD_PKT_INV_SPI",
          msg="decaps: rec'd IPSEC packet has invalid spi for destaddr=150.1.1.1, prot=50, spi=0x72662541(1919296833), srcaddr=150.3.1.3",
          sdata={".SDATA.meta.sequenceId": "91"})),
    # --- test_simple_message ------------------------------------------------
    ("default", "some message",
     dict(pri=13, ts=None, host=None, program="some", msg="message")),
]


@pytest.fixture(scope="module")
def parsed(spark):
    """Run every case through ONE job per parser config."""
    by_cfg = {}
    for i, (cfg, msg, exp) in enumerate(CASES):
        by_cfg.setdefault(cfg, []).append((i, msg))
    hint = datetime.datetime(2019, 2, 8)  # the C suite's fake wall clock
    out = {}
    for cfg, rows in by_cfg.items():
        df = spark.createDataFrame(
            [(i, m, hint) for i, m in rows], "case_id int, text string, ts timestamp"
        )
        kw = {"require_header": False}
        if cfg == "nohost":
            kw["flags"] = {"no-hostname"}
        elif cfg.startswith("bad:"):
            kw["bad_hostname"] = cfg[4:]
        res = parsers.syslog_parser(df, **kw)
        for r in res.collect():
            out[r["case_id"]] = r
    return out


@pytest.mark.parametrize(
    "idx", range(len(CASES)), ids=[f"{i}_{c[1][:34]}" for i, c in enumerate(CASES)]
)
def test_msgparse_case(parsed, idx):
    _cfg, msgtext, exp = CASES[idx]
    row = parsed[idx]
    assert row["syslog_matched"], msgtext
    for key, want in exp.items():
        got = {
            "pri": row["pri"], "ts": row["syslog_ts"], "host": row["host"],
            "program": row["program"], "pid": row["pid"],
            "msgid": row["msgid"], "msg": row["msg"],
        }.get(key, row["sdata"]) if key != "sdata" else row["sdata"]
        if key == "sdata":
            got = row["sdata"] or {}
            for k, v in want.items():
                assert got.get(k) == v, (msgtext, k, got)
        else:
            assert got == want, (msgtext, key, got, want)


def test_no_header_flag(spark):
    """LP_NO_HEADER: PRI parsed, everything else is the message."""
    df = spark.createDataFrame([("<189>some message",)], "text string")
    r = parsers.syslog_parser(df, flags={"no-header"}).collect()[0]
    assert r["pri"] == 189
    assert r["program"] is None and r["host"] is None
    assert r["msg"] == "some message"
