"""patternize (SLCT pattern mining) — port of the reference test tables
in modules/correlation/tests/test_patternize.c plus pattern-rendering,
strategy-equivalence, iterate-outliers and XML-roundtrip coverage.

The C fixtures split the input on '\\n' INCLUDING a trailing empty line
when the text ends with '\\n' (g_strsplit keeps it), and the message
part is the raw line (_get_logmessages prepends a syslog header which
LM_V_MESSAGE strips again) — mirrored here verbatim.
"""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators import patternize as PTZ

DELIMS = " :&~?![]=,;()'\""  # test_patternize.c:161


def _df(spark, logs: str):
    lines = logs.split("\n")
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "rid int, text string"
    )


# --- ptz_find_frequent_words (test_patternize.c:100-153) -----------------

FREQ_CASES = [
    # (logs, support, expected {"pos word": count}); cases whose C
    # 'expected' string is empty assert the semantics the C code
    # actually produces (the C check is vacuous for them)
    ("a\n", 0, {"0 a": 1}),
    ("a b\n", 0, {"0 a": 1, "1 b": 1}),
    ("a a\nb b", 0, {"0 a": 1, "1 a": 1, "0 b": 1, "1 b": 1}),
    ("a b\nb a", 0, {"0 a": 1, "1 a": 1, "0 b": 1, "1 b": 1}),
    ("a b\na b", 0, {"0 a": 2, "1 b": 2}),
    ("a\n", 1, {"0 a": 1}),
    ("a b\n", 1, {"0 a": 1, "1 b": 1}),
    ("a b\nb a", 1, {"0 a": 1, "1 a": 1, "0 b": 1, "1 b": 1}),
    ("a b\nb a\na c", 2, {"0 a": 2}),
]


@pytest.mark.parametrize("logs,support,expected", FREQ_CASES)
def test_frequent_words(spark, logs, support, expected):
    got = {
        f"{r.pos} {r.word}": r.cnt
        for r in PTZ.find_frequent_words(_df(spark, logs), support, DELIMS).collect()
    }
    for k, v in expected.items():
        assert got.get(k, 0) == v, f"word {k!r}: got {got.get(k, 0)}, want {v}"
    # support filter: nothing below the threshold survives
    assert all(v >= max(support, 0) for v in got.values())


# --- ptz_find_clusters_slct (test_patternize.c:296-361) ------------------

CLUSTER_CASES = [
    ("a\n", 0, [({0}, 1)]),
    ("a\nb\n", 0, [({0}, 1), ({1}, 1)]),
    ("a\nb\na\nb\n", 2, [({0, 2}, 2), ({1, 3}, 2)]),
    (
        "alma korte korte alma\nalma korte\nbela korte\nalma\n",
        1,
        [({0}, 1), ({1}, 1), ({2}, 1), ({3}, 1)],
    ),
    (
        "alma korte\nalma korte\nalma korte\nalma korte\n"
        "bela korte\nbela korte\nalma\n",
        2,
        [({0, 1, 2, 3}, 4), ({4, 5}, 2)],
    ),
    (
        "alma korte\nalma korte\nalma korte\nalma korte\n"
        "bela korte\nbela korte\nalma\n",
        3,
        [({0, 1, 2, 3}, 4)],
    ),
    (
        "alma korte asdf1 labda\nalma korte asdf2 labda\n"
        "alma korte asdf3 labda\nsallala\n",
        3,
        [({0, 1, 2}, 3)],
    ),
    (
        "alma korte asdf1 labda qwe1\nalma korte asdf2 labda qwe2\n"
        "alma korte asdf3 labda qwe3\nsallala\n",
        3,
        [({0, 1, 2}, 3)],
    ),
]


def _mine(spark, logs, support, strategy="broadcast", **kw):
    df = _df(spark, logs)
    keyed = PTZ.cluster_assignments(
        df, support, DELIMS, msg_col="text", strategy=strategy, id_col="rid", **kw
    )
    clusters = PTZ._clusters_from_assignments(keyed, support, "text", 1, "rid")
    members = {}
    surviving = {r.cluster_key for r in clusters.collect()}
    for r in keyed.collect():
        if r.ptz_candidate and r.ptz_key in surviving:
            members.setdefault(r.ptz_key, set()).add(r.rid)
    return clusters, members


@pytest.mark.parametrize("logs,support,expected", CLUSTER_CASES)
@pytest.mark.parametrize("strategy", ["broadcast", "distributed"])
def test_find_clusters_slct(spark, logs, support, expected, strategy):
    clusters, members = _mine(spark, logs, support, strategy)
    sizes = {k: len(v) for k, v in members.items()}
    for want_lines, want_support in expected:
        hit = [k for k, v in members.items() if v == want_lines]
        assert hit, f"no cluster with exactly lines {want_lines}; have {members}"
        assert sizes[hit[0]] == want_support


def test_strategies_identical(spark):
    logs = (
        "alma korte asdf1 labda qwe1\nalma korte asdf2 labda qwe2\n"
        "alma korte asdf3 labda qwe3\nsallala\n"
    )
    df = _df(spark, logs)
    a = PTZ.cluster_assignments(df, 3, DELIMS, "text", strategy="broadcast", id_col="rid")
    b = PTZ.cluster_assignments(df, 3, DELIMS, "text", strategy="distributed", id_col="rid")
    ra = {(r.rid, r.ptz_key, r.ptz_candidate, r.ptz_pattern) for r in a.collect()}
    rb = {(r.rid, r.ptz_key, r.ptz_candidate, r.ptz_pattern) for r in b.collect()}
    assert ra == rb


# --- pattern rendering (ptz_print_patterndb_rule, patternize.c:436-554) --


def _patterns(spark, logs, support, **kw):
    clusters = PTZ.patternize(
        _df(spark, logs), support=support, delimiters=DELIMS, msg_col="text",
        id_col="rid", **kw
    )
    return {r.pattern: r.support for r in clusters.collect()}


def test_pattern_estring_and_last_wildcard_dropped(spark):
    logs = (
        "alma korte asdf1 labda qwe1\nalma korte asdf2 labda qwe2\n"
        "alma korte asdf3 labda qwe3\nsallala\n"
    )
    pats = _patterns(spark, logs, 3)
    # wildcard at pos 2 renders @ESTRING:: @; the trailing wildcard at
    # pos 4 is DROPPED (patternize.c:491-495 'nasty workaround'); the
    # literal labda keeps its delimiter because a word follows it
    assert pats == {"alma korte @ESTRING:: @labda ": 3}


def test_pattern_named_parsers_counter(spark):
    logs = (
        "alma k1 korte k2 vege\nalma k3 korte k4 vege\nalma k5 korte k6 vege\n"
    )
    pats = _patterns(spark, logs, 3, named_parsers=True)
    assert pats == {
        "alma @ESTRING:.dict.string0: @korte @ESTRING:.dict.string1: @vege": 3
    }


def test_pattern_at_escaping(spark):
    logs = "user@host login ok\nuser@host login ok\nuser@host login ok\n"
    pats = _patterns(spark, logs, 3)
    assert pats == {"user@@host login ok": 3}


def test_pattern_delimiter_unicity(spark):
    # same words, different delimiters -> different clusters
    # (patternize.c:285-289 appends the delimiter sequence to the key)
    logs = "a b\na b\na,b\na,b\n"
    clusters, members = _mine(spark, logs, 2)
    assert sorted(len(v) for v in members.values()) == [2, 2]
    pats = _patterns(spark, logs, 2)
    assert pats == {"a b": 2, "a,b": 2}


def test_empty_message_never_candidate(spark):
    # g_strsplit_set('') yields no words -> no frequent words, never a
    # candidate (and F.split('') yielding [''] must not leak through)
    df = _df(spark, "\n\n\n")
    keyed = PTZ.cluster_assignments(df, 0, DELIMS, "text", strategy="broadcast")
    assert all(not r.ptz_candidate for r in keyed.collect())


def test_samples_and_defaults(spark):
    logs = "x y 1\nx y 2\nx y 3\n"
    clusters = PTZ.patternize(
        _df(spark, logs), support=3, delimiters=DELIMS, msg_col="text",
        id_col="rid", num_samples=2
    ).collect()
    assert len(clusters) == 1
    assert clusters[0].samples == ["x y 1", "x y 2"]  # first N by id order


def test_support_threshold_percent(spark):
    # pdbtool -S: percent of input lines, floor (ptz_load_file:625)
    logs = "\n".join(["a b"] * 50 + [f"z{i} q" for i in range(50)])
    clusters = PTZ.patternize(
        _df(spark, logs), support_threshold=40.0, delimiters=DELIMS,
        msg_col="text", id_col="rid"
    ).collect()
    # support = floor(100 * 0.40) = 40: 'a b' survives, and the z-lines
    # share '1 q' (q at pos 1 occurs 50x >= 40) so they cluster too,
    # with the leading wildcard rendered and the literal q kept
    assert {(r.pattern, r.support) for r in clusters} == {
        ("a b", 50),
        ("@ESTRING:: @q", 50),
    }


def test_iterate_outliers(spark):
    # round 1 at support=floor(12*0.5)=6 mines the 8-line template; the
    # 4 outliers re-run at support=floor(4*0.5)=2 and mine the second
    # template that was below round 1's bar (patternize.c:381-425)
    logs = "\n".join(["big tmpl one"] * 8 + [f"small tmpl {i}" for i in range(4)])
    pats = _patterns(spark, logs, None, support_threshold=50.0, iterate_outliers=True)
    # the small template's trailing wildcard is dropped, leaving the
    # literal prefix with its delimiter
    assert pats == {"big tmpl one": 8, "small tmpl ": 4}
    # without iteration only round 1's cluster appears
    pats1 = _patterns(spark, logs, None, support_threshold=50.0)
    assert pats1 == {"big tmpl one": 8}


def test_xml_roundtrip_classifies_members(spark):
    """Mined rules load through this engine's own PatternDB XML loader
    and classify the corpus they were mined from."""
    from syslog_ng_spark.operators.patterndb import load_patterndb_xml, patterndb

    logs = (
        "conn from 10.0.0.1 port 22\nconn from 10.0.0.2 port 80\n"
        "conn from 10.0.0.3 port 443\nwholly unrelated line\n"
    )
    clusters = PTZ.patternize(
        _df(spark, logs), support=3, delimiters=DELIMS, msg_col="text", id_col="rid"
    ).collect()
    xml = PTZ.clusters_to_patterndb_xml(clusters)
    rules, _actions = load_patterndb_xml(xml)
    assert len(rules) == 1
    df = _df(spark, logs).withColumn("program", F.lit("patternize"))
    out = patterndb(df, rules, program_col="program", text_col="text")
    got = {r.rid: r.pdb_class for r in out.collect()}
    assert got[0] == "system" and got[1] == "system" and got[2] == "system"
    assert got[3] is None or got[3] == "unknown"
