"""lib/tests/test_matcher.c ported table-driven: matcher-engine replace
(pcre + string modes) and match (string/glob) semantics.

Not ported (with reasons): the NON-ASCIIZ / indirect-value cases exercise
NVTable storage internals with no analogue in a columnar engine; the
iso-8859-2 case feeds invalid UTF-8 bytes (parquet strings are UTF-8 by
construction, TODO.md); num_matches bookkeeping is covered by
set-matches semantics in test_rewrite.py."""

import pytest

from syslog_ng_spark.functions.filters import FMatch
from syslog_ng_spark.operators.rewrite import subst

# (input, pattern, replacement, expected, matcher, flags, global)
REPLACE_CASES = [
    # pcre_regexp / replace
    ("árvíztűrőtükörfúrógép", "árvíz", "favíz", "favíztűrőtükörfúrógép", "pcre", set(), False),
    ("árvíztűrőtükörfúrógép", "^tűrő", "faró", "árvíztűrőtükörfúrógép", "pcre", set(), False),
    ("árvíztűrőtükörfúrógép", "tűrő", "", "árvíztükörfúrógép", "pcre", set(), False),
    ("wikiwiki", "wi", "", "kiki", "pcre", set(), True),
    ("wikiwiki", "wi", "kuku", "kukukikukuki", "pcre", set(), True),
    # back_ref
    ("wikiwiki", r"(wiki)\1", "", "", "pcre", set(), False),
    # empty matches with the global flag
    ("aa bb", "c*", "#", "#a#a# #b#b#", "pcre", set(), True),
    ("aa bb", "a*", "#", "## #b#b#", "pcre", set(), True),
    ("aa bb", "a*", "?", "?? ?b?b?", "pcre", set(), True),
    ("aa", "aa|b*", "@", "@@", "pcre", set(), True),
    ("aa", "aa|b*", "@", "@", "pcre", set(), False),
    # DOCUMENTED DIVERGENCE: after a zero-width match PCRE retries the
    # SAME offset anchored+non-empty ('b*|aa' then matches 'aa' -> '@@@');
    # the JVM engine advances one char instead, keeping the 'a' literal.
    ("aa", "b*|aa", "@", "@a@a@", "pcre", set(), True),
    ("aa", "b*|aa", "@", "@aa", "pcre", set(), False),
    # perl-style $1 in the replacement
    ("wikiwiki", "(wiki).+", "#$1#", "#wiki#", "pcre", set(), False),
    # pcre812_incompatibility: no match → unchanged
    ("wikiwiki", r"([[:digit:]]{1,3}\.){3}[[:digit:]]{1,3}", "foo", "wikiwiki", "pcre", set(), True),
    # string matcher modes
    ("árvíztűrőtükörfúrógép", "árvíz", "favíz", "favíztűrőtükörfúrógép", "string", {"prefix"}, False),
    ("árvíztűrőtükörfúrógép", "tűrő", "faró", "árvízfarótükörfúrógép", "string", {"substring"}, False),
    ("árvíztűrőtükörfúrógép", "tűrő", "", "árvíztükörfúrógép", "string", {"substring"}, False),
    ("árvíztűrőtükörfúrógép", "árvíztűrőtükörfúrógép", "almafa", "almafa", "string", set(), False),
    ("", "valami-amivel-nem-szabadna-matchelni", "almafa", "", "string", set(), False),
    ("abcdef", "ABCDEF", "qwerty", "qwerty", "string", {"prefix", "icase"}, False),
    ("abcdef", "BCD", "qwerty", "aqwertyef", "string", {"substring", "icase"}, False),
]

# (input, pattern, expected, matcher, flags)
MATCH_CASES = [
    ("val", "valami-amivel-nem-szabadna-matchelni", False, "string", set()),
    ("", "valami-amivel-nem-szabadna-matchelni", False, "string", set()),
    ("", "valami-amivel-nem-szabadna-matchelni", False, "string", {"prefix"}),
    ("", "valami-amivel-nem-szabadna-matchelni", False, "string", {"substring"}),
    ("match", "match", True, "string", set()),
    ("match", "ma", True, "string", {"prefix"}),
    ("match", "tch", True, "string", {"substring"}),
    ("árvíztűrőtükörfúrógép", "árvíz*", True, "glob", set()),
    ("árvíztűrőtükörfúrógép", "*fúrógép", True, "glob", set()),
    ("árvíztűrőtükörfúrógép", "*fúró*", True, "glob", set()),
    ("árvíztűrőtükörfúrógép", "tükör", False, "glob", set()),
    ("árvíztűrőtükörfúrógép", "viziló", False, "glob", set()),
]


@pytest.fixture(scope="module")
def replace_results(spark):
    out = {}
    for i, (text, pat, rep, _exp, matcher, fl, g) in enumerate(REPLACE_CASES):
        df = spark.createDataFrame([(text,)], "v string")
        out[i] = subst(
            df, pat, rep, "v", global_=g, matcher=matcher, flags=fl
        ).collect()[0]["v"]
    return out


@pytest.mark.parametrize(
    "i", range(len(REPLACE_CASES)),
    ids=[f"{i}_{c[4]}_{c[1][:16]}" for i, c in enumerate(REPLACE_CASES)],
)
def test_matcher_replace(replace_results, i):
    assert replace_results[i] == REPLACE_CASES[i][3], REPLACE_CASES[i]


def test_matcher_match(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_r) in enumerate(MATCH_CASES)], "i int, v string"
    )
    from pyspark.sql import functions as F

    cols = [
        FMatch(F.col("v"), pat, matcher=m, flags=frozenset(fl))
        .to_column().alias(f"m{i}")
        for i, (_t, pat, _e, m, fl) in enumerate(MATCH_CASES)
    ]
    rows = {r["i"]: r for r in df.select("i", *cols).collect()}
    for i, (text, pat, exp, m, fl) in enumerate(MATCH_CASES):
        assert bool(rows[i][f"m{i}"]) is exp, (text, pat, m, fl)
