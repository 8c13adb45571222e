"""Port of modules/xml/tests/test_xml_parser.c — invalid inputs, valid
key/value extraction, create-lists quoting (str-repr encode), single +
multiple exclude-tag globs, strip-whitespaces, prefix variants."""

import pytest

from syslog_ng_spark.operators.parsers import xml_parser


def _parse(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    row = xml_parser(df, **kw).head()
    return row["xml"], row["xml_matched"]


@pytest.mark.parametrize(
    "bad",
    [
        "<tag></missingtag>",
        "<tag></tag></extraclosetag>",
        "<tag><tag></tag>",
        "<tag1><tag2>closewrongorder</tag1></tag2>",
        '<tag id="missingquote></tag>',
        "<tag id='missingquote></tag>",
        '<tag id=missingquote"></tag>',
        "<tag id=missingquote'></tag>",
        "<space in tag/>",
        "</>",
        "<tag></tag>>",
    ],
)
def test_invalid_inputs(spark, bad):
    xml, matched = _parse(spark, bad)
    assert xml is None and not matched


@pytest.mark.parametrize(
    "text,key,value",
    [
        ("<tag1>value1</tag1>", ".xml.tag1", "value1"),
        ("<tag1 attr='attr_value'>value1</tag1>", ".xml.tag1._attr", "attr_value"),
        ("<tag1><tag2>value2</tag2></tag1>", ".xml.tag1.tag2", "value2"),
        ("<tag1>part1<tag2>value2</tag2>part2</tag1>", ".xml.tag1", "part1part2"),
        ("<tag1><tag11></tag11><tag12><tag121>value</tag121></tag12></tag1>",
         ".xml.tag1.tag12.tag121", "value"),
        ("<tag1><tag11></tag11><tag12><tag121 attr1='1' attr2='2'>value</tag121></tag12></tag1>",
         ".xml.tag1.tag12.tag121._attr1", "1"),
        ("<tag1><tag11></tag11><tag12><tag121 attr1='1' attr2='2'>value</tag121></tag12></tag1>",
         ".xml.tag1.tag12.tag121._attr2", "2"),
        ("<tag1><tag1>t11.1</tag1><tag1>t11.2</tag1></tag1>",
         ".xml.tag1.tag1", "t11.1,t11.2"),
    ],
)
def test_valid_inputs(spark, text, key, value):
    xml, _ = _parse(spark, text)
    assert xml[key] == value


@pytest.mark.parametrize(
    "text,create_lists,key,value",
    [
        ("<tag1><simple_namevalue> value,2 </simple_namevalue></tag1>", False,
         ".xml.tag1.simple_namevalue", " value,2 "),
        ("<tag1><simple_namevalue> value,2 </simple_namevalue></tag1>", True,
         ".xml.tag1.simple_namevalue", '" value,2 "'),
        ("<events><data>1</data><data> 2 </data></events>", True,
         ".xml.events.data", '1," 2 "'),
        ("<events><data>1</data><data> 2 </data><data>3,</data><data>4</data></events>",
         True, ".xml.events.data", '1," 2 ","3,",4'),
        ("<noquotes><data>one</data><data>two</data><data>three</data></noquotes>",
         True, ".xml.noquotes.data", "one,two,three"),
        ("<array><data>,first element</data><data>second element</data><data>Third element</data></array>",
         True, ".xml.array.data",
         '",first element","second element","Third element"'),
        ('<array><data>"Quoted elements escaped with single-quote"</data><data>unquoted with double-quotes</data></array>',
         True, ".xml.array.data",
         '\'"Quoted elements escaped with single-quote"\',"unquoted with double-quotes"'),
        ("<array><data>'Single quoted becomes quoted'</data><data>simple</data></array>",
         True, ".xml.array.data", "\"'Single quoted becomes quoted'\",simple"),
        ("<events><data>first</data><data>second</data></events>", False,
         ".xml.events.data", "firstsecond"),
        ("<events><data>first</data><data>second, long entry</data></events>",
         False, ".xml.events.data", "firstsecond, long entry"),
    ],
)
def test_list_quoting_array_elements(spark, text, create_lists, key, value):
    xml, _ = _parse(spark, text, create_lists=create_lists)
    assert xml[key] == value


@pytest.mark.parametrize(
    "pattern,key,value",
    [
        ("longtag", ".xml.longtag", None),
        ("longt?g", ".xml.longtag", None),
        ("?ongtag", ".xml.longtag", None),
        ("longta?", ".xml.longtag", None),
        ("lon?ta?", ".xml.longtag", None),
        ("longt*", ".xml.longtag", None),
        ("*tag", ".xml.longtag", None),
        ("lo*gtag", ".xml.longtag", None),
        ("long*ag", ".xml.longtag", None),
        ("*", ".xml.longtag", None),
        ("longtag_break", ".xml.longtag", "Text"),
        ("longta?_break", ".xml.longtag", "Text"),
        ("lon?ta?_break", ".xml.longtag", "Text"),
        ("break_longt*", ".xml.longtag", "Text"),
        ("lo*gtag_break", ".xml.longtag", "Text"),
        ("break_long*ag", ".xml.longtag", "Text"),
        ("*tag_break", ".xml.longtag", "Text"),
    ],
)
def test_single_exclude_tags(spark, pattern, key, value):
    xml, _ = _parse(spark, "<longtag>Text</longtag>", exclude_tags=[pattern])
    assert (xml or {}).get(key) == value


def test_exclude_inner_subtree(spark):
    xml, _ = _parse(
        spark, "<longtag>Outer<inner>Inner</inner></longtag>",
        exclude_tags=["inner"],
    )
    assert xml[".xml.longtag"] == "Outer"
    assert ".xml.longtag.inner" not in xml


def test_exclude_in_multi_root_fragment(spark):
    text = ("<exclude>excude1Text</exclude>"
            "<notexclude>notexcludeText<exclude>excude2Text</exclude></notexclude>")
    xml, _ = _parse(spark, text, exclude_tags=["exclude"])
    assert ".xml.exclude" not in xml
    assert ".xml.notexclude.exclude" not in xml
    assert xml[".xml.notexclude"] == "notexcludeText"


def test_multiple_exclude_tags(spark):
    text = ("<tag1>Text1</tag1><tag2>Text2</tag2>"
            "<tag3>Text3<innertag>TextInner</innertag></tag3>")
    xml, _ = _parse(spark, text, exclude_tags=["tag1", "tag2", "inner*"])
    assert ".xml.tag1" not in xml
    assert ".xml.tag2" not in xml
    assert xml[".xml.tag3"] == "Text3"
    assert ".xml.tag3.innertag" not in xml


def test_strip_whitespaces(spark):
    xml, _ = _parse(
        spark, "<tag> \n\t part1 <tag2/> part2 \n\n</tag>",
        strip_whitespaces=True,
    )
    assert xml[".xml.tag"] == "part1part2"


@pytest.mark.parametrize(
    "text,prefix,key,value",
    [
        ("<tag>default_prefix</tag>", None, ".xml.tag", "default_prefix"),
        ("<tag>foo</tag>", "", "tag", "foo"),
        ("<tag>foobar</tag>", ".xmlparser", ".xmlparser.tag", "foobar"),
        ("<tag>baz</tag>", ".meta.", ".meta.tag", "baz"),
        ("<top><t1>asd</t1><t2>jkl</t2></top>", "", "top.t2", "jkl"),
        ("<top><t1>1</t1><t2><t3>3</t3></t2></top>", "", "top.t2.t3", "3"),
        ("<top><t1>1</t1><t2><t3>3</t3></t2><misc>value</misc></top>", "",
         "top.misc", "value"),
    ],
)
def test_prefix_variants(spark, text, prefix, key, value):
    kw = {} if prefix is None else {"prefix": prefix}
    xml, _ = _parse(spark, text, **kw)
    assert xml[key] == value


@pytest.mark.parametrize(
    "value,expected",
    [
        # lib/str-repr/tests/test_encode.c (no forbidden chars)
        ("", '""'),
        ("a", "a"),
        ("alma", "alma"),
        ("al\nma", '"al\\nma"'),
        ("foo bar", '"foo bar"'),
        ('"value1', "'\"value1'"),
        ("'value1", "\"'value1\""),
        ("\b \f \n \r \t \\", '"\\b \\f \\n \\r \\t \\\\"'),
    ],
)
def test_str_repr_encode_port(value, expected):
    from syslog_ng_spark.operators.parsers import _str_repr_encode

    assert _str_repr_encode(value, forbidden="") == expected


@pytest.mark.parametrize(
    "value,forbidden,expected",
    [
        ("foo,", ",", '"foo,"'),
        ("\"'foo,", ",", '"\\"\'foo,"'),
    ],
)
def test_str_repr_encode_forbidden_port(value, forbidden, expected):
    from syslog_ng_spark.operators.parsers import _str_repr_encode

    assert _str_repr_encode(value, forbidden=forbidden) == expected
