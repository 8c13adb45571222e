"""Smart multi-line FSM — the reference's own test corpus
(lib/multi-line/tests/test_smart_multi_line.c) ported table-driven:
each case is (input lines, expected records)."""

import pytest

from syslog_ng_spark.operators.smart_multiline import SmartMultiLine
from syslog_ng_spark.operators import parsers


def records(lines):
    """Pure-Python reference of the grouping the Spark path performs:
    split on is_start flags, join with newlines."""
    fsm = SmartMultiLine()
    out, cur = [], []
    for ln in lines:
        if fsm.is_start(ln) and cur:
            out.append("\n".join(cur))
            cur = []
        cur.append(ln)
    if cur:
        out.append("\n".join(cur))
    return out


PY_TRACE = [
    "Traceback (most recent call last):",
    'File "./lib/merge-grammar.py", line 62, in <module>',
    '  for line in fileinput.input(openhook=fileinput.hook_encoded("utf-8")):',
    'File "/usr/lib/python3.8/fileinput.py", line 248, in __next__',
    "  line = self._readline()",
    'File "/usr/lib/python3.8/fileinput.py", line 368, in _readline',
    "  return self._readline()",
]


def test_three_unrelated_lines_are_separate_records():
    lines = [
        "this is an initial line that is consumed",
        "another line that is not part of a traceback",
        "yet another line that is not part of a traceback",
    ]
    assert records(lines) == lines


def test_python_backtrace():
    assert records(PY_TRACE) == ["\n".join(PY_TRACE)]


def test_python_backtrace_with_trailing_exception_text():
    lines = PY_TRACE + ["ValueError: whatever exception that happened"]
    assert records(lines) == ["\n".join(lines)]


def test_single_and_multi_line_interleaved():
    def tb(n):
        return [
            "Traceback (most recent call last):",
            f'File "./lib/merge-grammar{n}.py", line 62, in <module>',
            "  for line in fileinput.input():",
        ]

    lines = (
        ["this is something unrelated", "again something unrelated"]
        + tb(1) + tb(2) + tb(3) + ["unrelated line here"]
    )
    got = records(lines)
    assert got[0] == "this is something unrelated"
    assert got[1] == "again something unrelated"
    assert got[2] == "\n".join(tb(1))
    assert got[3] == "\n".join(tb(2))
    assert got[4] == "\n".join(tb(3))
    assert got[5] == "unrelated line here"


def test_java_backtrace_with_nested_and_caused_by():
    lines = [
        "java.lang.RuntimeException: javax.mail.SendFailedException: Invalid Addresses;",
        "  nested exception is:",
        "com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 Relaying denied",
        "\tat com.nethunt.crm.api.server.adminsync.AutomaticEmailFacade.sendWithSmtp(AutomaticEmailFacade.java:236)",
        "\tat java.util.Optional.ifPresent(Optional.java:159)",
        "\tat java.base/java.lang.Thread.run(Thread.java:748)",
        "Caused by: javax.mail.SendFailedException: Invalid Addresses;",
        "  nested exception is:",
        "com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 Relaying denied",
        "\tat com.sun.mail.smtp.SMTPTransport.rcptTo(SMTPTransport.java:2064)",
        "\t... 12 more",
        "Caused by: com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 Relaying denied",
    ]
    assert records(lines) == ["\n".join(lines)]


def test_js_backtrace():
    lines = [
        "ReferenceError: myArray is not defined",
        "  at next (/app/node_modules/express/lib/router/index.js:256:14)",
        "  at /app/node_modules/express/lib/router/index.js:615:15",
        "  at Layer.handle [as handle_request] (/app/node_modules/express/lib/router/layer.js:95:5)",
        "  at /app/app.js:52:3",
    ]
    assert records(lines) == ["\n".join(lines)]


def test_php_two_backtraces_back_to_back():
    t1 = [
        "exception 'Exception' with message 'Custom exception' in /home/joe/work/test-php/test.php:5",
        "Stack trace:",
        "#0 /home/joe/work/test-php/test.php(9): func1()",
        "#1 /home/joe/work/test-php/test.php(13): func2()",
        "#2 {main}",
    ]
    t2 = [
        "PHP Fatal error:  Uncaught exception 'Exception' with message 'message' in errors.php:60",
        "Stack trace:",
        "#0 [internal function]: ErrorEntryGenerator::{closure}()",
        "#1 errors.php(20): call_user_func_array(Object(Closure), Array)",
        "#2 {main}",
        "  thrown in errors.php on line 60",
    ]
    assert records(t1 + t2) == ["\n".join(t1), "\n".join(t2)]


def test_go_backtrace_with_goroutines():
    lines = [
        "panic: my panic",
        "",
        "goroutine 4 [running]:",
        "panic(0x45cb40, 0x47ad70)",
        "\t/usr/local/go/src/runtime/panic.go:542 +0x46c fp=0xc42003f7b8",
        "main.main.func1(0xc420024120)",
        "\tfoo.go:6 +0x39 fp=0xc42003f7d8",
        "created by main.main",
        "\tfoo.go:5 +0x58",
        "",
        "goroutine 1 [chan receive]:",
        "runtime.gopark(0x4739b8, 0xc420024178)",
        "\t/usr/local/go/src/runtime/proc.go:280 +0x12c",
        "runtime.goexit()",
        "\t/usr/local/go/src/runtime/asm_amd64.s:2337 +0x1",
    ]
    assert records(lines) == ["\n".join(lines)]


def test_ruby_rails_backtrace():
    t1 = [
        " NoMethodError (undefined method `resursivewordload' for #<BooksController:0x007f8dd9a0c738>):",
        "  app/controllers/books_controller.rb:69:in `recursivewordload'",
        "  app/controllers/books_controller.rb:75:in `loadword'",
        "  config/error_reporting_logger.rb:62:in `tagged'",
    ]
    t2 = [
        ' ActionController::RoutingError (No route matches [GET] "/settings"):',
        "  ",
        "  actionpack (5.1.4) lib/action_dispatch/middleware/debug_exceptions.rb:63:in `call'",
        "  puma (3.10.0) lib/puma/thread_pool.rb:120:in `block in spawn_thread'",
    ]
    assert records(t1 + t2) == ["\n".join(t1), "\n".join(t2)]


def test_dart_backtrace():
    lines = [
        "Unhandled exception:",
        "RangeError (index): Invalid value: Valid value range is empty: 1",
        "#0      List.[] (dart:core-patch/growable_array.dart:151)",
        "#1      main.<anonymous closure> (file:///path/to/code/dartFile.dart:31:23)",
        "#5      _RawReceivePortImpl._handleMessage (dart:isolate-patch/isolate_patch.dart:151)",
    ]
    assert records(lines) == ["\n".join(lines)]


def test_spark_path_matches_python_reference(spark):
    """The distributed group_lines(mode='smart') must produce exactly the
    per-stream records the pure-Python FSM driver produces."""
    import datetime

    lines = (
        ["noise before"]
        + PY_TRACE
        + ["ValueError: boom", "noise after"]
        + ["panic: go down", "", "goroutine 1 [running]:", "main.main()", "\tfoo.go:9"]
    )
    ts = datetime.datetime(2026, 1, 1)
    rows = [("s1", i, t, ts) for i, t in enumerate(lines)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts timestamp")
    got = [
        r.text
        for r in parsers.group_lines(df, key=["conv_id"], mode="smart")
        .orderBy("turn_idx")
        .collect()
    ]
    assert got == records(lines)
