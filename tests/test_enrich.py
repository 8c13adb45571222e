"""Enrichment tests: add-contextual-data (with default-selector fallback)
and the CIDR geoip lookup — mirroring modules/add-contextual-data and
modules/geoip2 behavior."""

from pyspark.sql import functions as F

from syslog_ng_spark.operators.enrich import (
    add_contextual_data,
    cidr_table,
    ctx_get,
    geoip,
    in_list_semi_join,
)


def _ctx(spark):
    return spark.createDataFrame(
        [
            ("bash", "team", "infra"),
            ("bash", "cost_center", "cc-7"),
            ("search", "team", "web"),
            ("default", "team", "unknown"),
        ],
        "selector string, name string, value string",
    )


def test_contextual_data_join(spark):
    df = spark.createDataFrame(
        [("bash",), ("search",), ("zzz",), (None,)], "tool string"
    )
    out = add_contextual_data(
        df,
        _ctx(spark),
        F.coalesce(F.col("tool"), F.lit("default")),
        default_selector="default",
    )
    rows = {r.tool: r.ctx for r in out.collect()}
    assert rows["bash"] == {"team": "infra", "cost_center": "cc-7"}
    assert rows["search"] == {"team": "web"}
    assert rows["zzz"] == {"team": "unknown"}  # default-selector fallback
    assert rows[None] == {"team": "unknown"}


def test_contextual_data_prefix_and_get(spark):
    df = spark.createDataFrame([("bash",)], "tool string")
    out = add_contextual_data(df, _ctx(spark), "tool", prefix=".ctx.")
    row = out.select(ctx_get("ctx", ".ctx.team").alias("team")).collect()[0]
    assert row.team == "infra"


def test_geoip_lookup(spark):
    lookup = cidr_table(
        spark,
        [
            ("10.0.0.0/8", {"country": "PrivateA"}),
            ("10.1.0.0/16", {"country": "PrivateA1"}),  # more specific
            ("192.168.0.0/24", {"country": "Lan"}),
        ],
    )
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.200.0.1",), ("192.168.0.9",), ("8.8.8.8",)],
        "src_ip string",
    )
    out = {r.src_ip: r.geo for r in geoip(df, lookup).collect()}
    assert out["10.1.2.3"] == {"country": "PrivateA1"}  # longest prefix wins
    assert out["10.200.0.1"] == {"country": "PrivateA"}
    assert out["192.168.0.9"] == {"country": "Lan"}
    assert out["8.8.8.8"] is None


def test_geoip_plan_is_broadcast(spark):
    lookup = cidr_table(spark, [("10.0.0.0/8", {"c": "x"})])
    df = spark.createDataFrame([("10.1.2.3",)], "src_ip string")
    plan = geoip(df, lookup)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_in_list_semi_join(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    vals = spark.createDataFrame([("a",)], "k string")
    assert [r.k for r in in_list_semi_join(df, vals, "k").collect()] == ["a"]


def test_geoip_column_join_free(spark):
    from syslog_ng_spark.operators.enrich import geoip_column

    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.200.0.1",), ("8.8.8.8",)], "src_ip string"
    )
    col = geoip_column(
        "src_ip", [("10.0.0.0/8", "privA"), ("10.1.0.0/16", "privA1")]
    )
    got = [r[0] for r in df.select(col).collect()]
    assert got == ["privA1", "privA", None]  # longest prefix wins
    # plan is join-free: pure projection over the scan
    plan = df.select(col)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_geoip6_lookup(spark):
    from syslog_ng_spark.operators.enrich import cidr6_table, geoip6

    lookup = cidr6_table(
        spark,
        [
            ("2001:db8::/32", {"country": "doc"}),
            ("2001:db8:aaaa::/48", {"country": "doc-aaaa"}),  # more specific
            ("fd00::/8", {"country": "ula"}),
        ],
    )
    df = spark.createDataFrame(
        [("2001:db8::1",), ("2001:db8:aaaa::5",), ("fd12::1",), ("2600::1",), ("junk",)],
        "src_ip string",
    )
    got = {r.src_ip: r.geo for r in geoip6(df, lookup).collect()}
    assert got["2001:db8::1"] == {"country": "doc"}
    assert got["2001:db8:aaaa::5"] == {"country": "doc-aaaa"}
    assert got["fd12::1"] == {"country": "ula"}
    assert got["2600::1"] is None
    assert got["junk"] is None


def test_geoip6_longest_prefix_beyond_64(spark):
    """Nested prefixes longer than /64 have identical hi-64 spans; the
    most-specific (longest prefixlen) must still win."""
    from syslog_ng_spark.operators.enrich import cidr6_table, geoip6

    lookup = cidr6_table(
        spark,
        [
            ("2001:db8::/64", {"net": "outer"}),
            ("2001:db8::/112", {"net": "mid"}),
            ("2001:db8::/120", {"net": "inner"}),
        ],
    )
    df = spark.createDataFrame(
        [("2001:db8::1",), ("2001:db8::1ff",), ("2001:db8::1:0",)],
        "src_ip string",
    )
    got = {r.src_ip: r.geo["net"] for r in geoip6(df, lookup).collect()}
    assert got["2001:db8::1"] == "inner"    # inside /120
    assert got["2001:db8::1ff"] == "mid"    # inside /112, outside /120
    assert got["2001:db8::1:0"] == "outer"  # inside /64 only


def test_dns_resolve_ip_hosts_table(spark):
    from syslog_ng_spark.operators.enrich import dns_resolve_ip, load_hosts_file

    hosts = spark.createDataFrame(
        [("10.0.0.1", "web-1"), ("10.0.0.2", "db-1")], "ip string, hostname string"
    )
    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.0.9",)], "src_ip string"
    )
    got = {r.src_ip: r.hostname for r in dns_resolve_ip(df, hosts).collect()}
    assert got == {"10.0.0.1": "web-1", "10.0.0.9": "10.0.0.9"}
    # /etc/hosts parses into the same shape (localhost is always there)
    h = load_hosts_file(spark)
    assert ("127.0.0.1",) in {(r.ip,) for r in h.collect()}


def test_getent_passwd_group_services(spark):
    """modules/getent semantics: numeric key -> 'name' member default,
    name key -> uid/gid default; explicit members; group members
    comma-joined; services translate name<->port; unknown keys NULL."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.enrich import (
        getent, getent_enrich, register_getent_table,
    )

    register_getent_table("passwd", [
        {"name": "root", "uid": 0, "gid": 0, "gecos": "root",
         "dir": "/root", "shell": "/bin/bash"},
        {"name": "alice", "uid": 1000, "gid": 100, "gecos": "",
         "dir": "/home/alice", "shell": "/bin/zsh"},
    ])
    register_getent_table("group", [
        {"name": "wheel", "gid": 10, "members": ["root", "alice"]},
        {"name": "empty", "gid": 99, "members": []},
    ])
    register_getent_table("services", [
        {"name": "ssh", "number": 22}, {"name": "https", "number": 443},
    ])

    df = spark.createDataFrame(
        [("0", "alice", "wheel", "443")], "uid string, user string, grp string, port string"
    )
    row = df.select(
        getent("passwd", "uid").alias("a"),          # numeric -> name
        getent("passwd", "user").alias("b"),         # name -> uid
        getent("passwd", "user", "shell").alias("c"),
        getent("group", "grp").alias("d"),           # name -> gid
        getent("group", F.lit("10"), "members").alias("e"),
        getent("services", "port").alias("f"),       # port -> name
        getent("services", F.lit("ssh")).alias("g"), # name -> port
        getent("passwd", F.lit("nosuch")).alias("h"),
    ).collect()[0]
    assert row["a"] == "root"
    assert row["b"] == "1000"
    assert row["c"] == "/bin/zsh"
    assert row["d"] == "10"
    assert row["e"] == "root,alice"
    assert row["f"] == "https"
    assert row["g"] == "22"
    assert row["h"] is None

    out = getent_enrich(df, "passwd", "uid", member="dir", target="home").collect()[0]
    assert out["home"] == "/root"

    # template-function surface
    from syslog_ng_spark.functions.templates import compile_template

    t = df.select(
        compile_template("$(getent passwd ${uid} shell)", set(df.columns)).alias("t")
    ).collect()[0]["t"]
    assert t == "/bin/bash"


def test_getent_loads_os_files(spark, tmp_path):
    """load_getent_from_os parses the standard /etc file formats."""
    from syslog_ng_spark.operators.enrich import getent, load_getent_from_os

    (tmp_path / "passwd").write_text(
        "root:x:0:0:root:/root:/bin/bash\ndaemon:x:1:1:d:/usr/sbin:/usr/sbin/nologin\n"
    )
    (tmp_path / "group").write_text("adm:x:4:syslog,ubuntu\n")
    (tmp_path / "services").write_text(
        "# comment\nssh\t22/tcp\nhttp\t80/tcp\twww  # alias\n"
    )
    load_getent_from_os(str(tmp_path))
    df = spark.createDataFrame([("x",)], "x string")
    from pyspark.sql import functions as F

    row = df.select(
        getent("passwd", F.lit("1"), "shell").alias("a"),
        getent("group", F.lit("adm"), "members").alias("b"),
        getent("services", F.lit("80")).alias("c"),
    ).collect()[0]
    assert row["a"] == "/usr/sbin/nologin"
    assert row["b"] == "syslog,ubuntu"
    assert row["c"] == "http"


def test_glob_selector_port(spark):
    """Port of modules/add-contextual-data/tests/test_glob_selector.c."""
    from syslog_ng_spark.operators.enrich import glob_selector

    df = spark.createDataFrame(
        [("localhost", "p"), ("lacalhost", "p"), ("otherhost", "goodprog"),
         ("otherhost", "goodish"), ("otherhost", "unrelated")],
        "host string, program string",
    )
    # first expr that matches the expanded template wins
    sel = glob_selector("host", ["local*", "loc*", "lac*"])
    got = [r[0] for r in df.select(sel).collect()]
    assert got[:2] == ["local*", "lac*"]
    # later position in the list still resolves
    sel2 = glob_selector("program", ["unmatch1", "unmatch2", "good*"])
    got2 = [r[0] for r in df.select(sel2).collect()]
    assert got2[2] == "good*" and got2[3] == "good*"
    # NULL when no pattern matches
    assert got2[4] is None
    assert got[4] is None


def test_glob_selector_anchored_full_string(spark):
    """Globs match the FULL string (g_pattern_match): 'local*' must NOT
    match 'mylocalhost' and exact glob 'foo' must NOT match 'xfoo'."""
    from syslog_ng_spark.operators.enrich import glob_selector

    df = spark.createDataFrame(
        [("mylocalhost",), ("xfoo",), ("foo",), ("localhost",)],
        "host string",
    )
    got = [r[0] for r in df.select(glob_selector("host", ["local*", "foo"])).collect()]
    assert got == [None, None, "foo", "local*"]


def test_filter_selector_port(spark):
    """Port of tests/test_filter_selector.c: first matching filter's
    NAME becomes the selector."""
    from syslog_ng_spark.operators.enrich import filter_selector
    from syslog_ng_spark.functions import filters as FL

    df = spark.createDataFrame(
        [("testmsg", "localhost"), ("other", "localhost"),
         ("other", "remote")],
        "text string, host string",  # MESSAGE lives in the text column
    )
    sel = filter_selector([
        ("f_msg", FL.message("testmsg")),
        ("f_localhost", FL.host("localhost")),
    ])
    got = [r[0] for r in df.select(sel).collect()]
    # msg filter ordered first wins on the first row; host filter
    # catches the second; nothing matches the third
    assert got == ["f_msg", "f_localhost", None]


def test_glob_selector_with_add_contextual_data(spark):
    """Selectors compose with the broadcast enrich join: context rows
    keyed by glob, messages resolved through glob_selector."""
    from syslog_ng_spark.operators.enrich import (
        add_contextual_data,
        glob_selector,
    )

    ctx = spark.createDataFrame(
        [("local*", "zone", "dc1"), ("prod-*", "zone", "dc2")],
        "selector string, name string, value string",
    )
    df = spark.createDataFrame(
        [("localhost",), ("prod-web3",), ("stray",)], "host string"
    )
    out = add_contextual_data(
        df, ctx, selector=glob_selector("host", ["local*", "prod-*"])
    )
    from syslog_ng_spark.operators.enrich import ctx_get  # noqa: F401
    rows = {r["host"]: r["ctx"] for r in out.collect()}
    assert rows["localhost"]["zone"] == "dc1"
    assert rows["prod-web3"]["zone"] == "dc2"
    assert rows["stray"] is None


def test_context_info_db_csv_import(spark, tmp_path):
    """Port of tests/test_context_info_db.c csv-import cases: triplets,
    blank-line skip, column-count rejection, name-prefix, ordered
    selectors (context_info_db_enable_ordering), end-to-end with
    glob_selector."""
    import pytest as _pytest

    from syslog_ng_spark.operators.enrich import (
        add_contextual_data,
        context_info_db_from_csv,
        glob_selector,
    )

    csv_file = tmp_path / "ctx.csv"
    csv_file.write_text(
        'prod-*,zone,dc2\n'
        '\n'
        'local*,zone,dc1\n'
        'local*,owner,"ops, team"\n'
    )
    ctx, ordered = context_info_db_from_csv(spark, str(csv_file))
    # first-appearance order drives glob precedence
    assert ordered == ["prod-*", "local*"]
    assert ctx.count() == 3
    # quoted CSV values survive
    owner = ctx.filter("name = 'owner'").head()["value"]
    assert owner == "ops, team"

    df = spark.createDataFrame([("localhost",), ("prod-9",)], "host string")
    out = add_contextual_data(
        df, ctx, selector=glob_selector("host", ordered)
    )
    rows = {r["host"]: r["ctx"] for r in out.collect()}
    assert rows["localhost"]["zone"] == "dc1"
    assert rows["localhost"]["owner"] == "ops, team"
    assert rows["prod-9"]["zone"] == "dc2"

    # name-prefix prepends; bad column count rejects the whole import
    ctx2, _ = context_info_db_from_csv(
        spark, lines=["s1,k,v"], name_prefix=".meta."
    )
    assert ctx2.head()["name"] == ".meta.k"
    with _pytest.raises(ValueError):
        context_info_db_from_csv(spark, lines=["a,b"])
    with _pytest.raises(ValueError):
        context_info_db_from_csv(spark, lines=["a,b,c,d"])


def test_set_value_on_error_modes(spark):
    """on-error (lib/template/tests/test_template_on_error.c modes)
    applied to typed set(): drop-property -> NULL, fallback-to-string
    -> original text, drop-message -> row dropped; silently- variants
    parse to the same behavior."""
    import pytest as _pytest

    from syslog_ng_spark.operators import rewrite as RW

    df = spark.createDataFrame([("12",), ("bogus",)], "v string")
    drop_prop = RW.set_value(df, "n", "int64($v)")
    assert [r["n"] for r in drop_prop.orderBy("v").collect()] == [12, None]

    fb = RW.set_value(df, "n", "int64($v)", on_error="fallback-to-string")
    assert [r["n"] for r in fb.orderBy("v").collect()] == ["12", "bogus"]

    dm = RW.set_value(
        df, "n", "int64($v)", on_error="silently-drop-message"
    )
    assert [r["v"] for r in dm.collect()] == ["12"]

    with _pytest.raises(ValueError):
        RW.set_value(df, "n", "int64($v)", on_error="explode")
