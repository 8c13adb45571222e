"""Exact smart multi-line state machine.

Port of the reference's trained FSM (lib/multi-line/smart-multi-line.fsm
— a declarative TSV of (from-states, regex, to-state) rules, originally
extracted from fluent-plugin-detect-exceptions, Apache-2.0) and its
driver semantics (lib/multi-line/smart-multi-line.c:267-303
``_process_segment``): run the current line through the current state's
rules; on no match, reset and retry once from ``start_state`` (a line
may end one trace and begin another); a line matching neither pass is a
standalone record.

Batch shape: the FSM is inherently sequential per stream, so the flags
are computed by ONE ``applyInPandas`` pass per ``key`` group (the same
exact-serial pattern as the token bucket) and the actual line assembly
stays in distributed column expressions (``_group_lines_assemble``'s
running-sum + group-concat).
"""

from __future__ import annotations

import re as _re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# smart-multi-line.fsm translated rule-for-rule; regexes are searched
# (not anchored) against the line WITHOUT its trailing newline, exactly
# as the reference feeds segments.
_FSM_TABLE = [
    # java / js (V8)
    (("start_state", "java_start_exception"),
     r"(?:Exception|Error|Throwable|V8 errors stack trace)[:\r\n]", "java_after_exception"),
    (("java_after_exception",), r"^[\t ]*nested exception is:[\t ]*", "java_start_exception"),
    (("java_after_exception",), r"^[\r\n]*$", "java_after_exception"),
    (("java_after_exception", "java"), r"^[\t ]+(?:eval )?at ", "java"),
    (("java_after_exception", "java"),
     r"^[\t ]+--- End of inner exception stack trace ---$", "java"),
    (("java_after_exception", "java"),
     r"^--- End of stack trace from previous location where exception was thrown ---$", "java"),
    (("java_after_exception", "java"), r"^[\t ]*(?:Caused by|Suppressed):", "java_after_exception"),
    (("java_after_exception", "java"),
     r"^[\t ]*... \d+ (?:more|common frames omitted)", "java"),
    # python
    (("start_state",), r"^Traceback \(most recent call last\):$", "python"),
    (("python",), r"^[\t ]*File ", "python_code"),
    (("python_code",), r"[^\t ]", "python"),
    (("python",), r"^(?:[^\s.():]+\.)*[^\s.():]+:", "start_state"),
    # PHP
    (("start_state",),
     r"(?:PHP (?:Notice|Parse error|Fatal error|Warning):)|(?:exception '[^']+' with message ')",
     "php_stack_begin"),
    (("php_stack_begin",), r"^Stack trace:", "php_stack_frames"),
    (("php_stack_frames",), r"^#\d", "php_stack_frames"),
    (("php_stack_frames",), r"^\s+thrown in ", "start_state"),
    # Go
    (("start_state",), r"\bpanic: ", "go_after_panic"),
    (("start_state",), r"http: panic serving", "go_goroutine"),
    (("go_after_panic", "go_after_signal", "go_frame_1"), r"^$", "go_goroutine"),
    (("go_after_panic",), r"^\[signal ", "go_after_signal"),
    (("go_goroutine",), r"^goroutine \d+ \[[^\]]+\]:$", "go_frame_1"),
    (("go_frame_1",), r"^(?:[^\s.:]+\.)*[^\s.():]+\(|^created by ", "go_frame_2"),
    (("go_frame_2",), r"^\s", "go_frame_1"),
    # Ruby
    (("start_state",), r"Error \(.*\):$", "ruby_before_rails_trace"),
    (("ruby_before_rails_trace",), r"^  $", "ruby"),
    (("ruby_before_rails_trace",), r"^[\t ]+.*?\.rb:\d+:in `", "ruby"),
    (("ruby",), r"^[\t ]+.*?\.rb:\d+:in `", "ruby"),
    # Dart
    (("start_state",), r"^Unhandled exception:$", "dart_exc"),
    (("dart_exc",),
     r"^(Instance of)|(Exception)|(Bad state)|(IntegerDivisionByZeroException)"
     r"|(Invalid argument)|(RangeError)|(Assertion failed)|(Cannot instantiate)"
     r"|(Reading static variable)|(UnimplementedError)|(Unsupported operation)"
     r"|(Concurrent modification)|(Out of Memory)|(Stack Overflow)", "dart_stack"),
    (("dart_exc",), r"^'.+?':.+?$", "dart_type_err_1"),
    (("dart_type_err_1",), r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    (("dart_type_err_1",), r"^.+?$", "dart_type_err_2"),
    (("dart_type_err_2",), r"^.*?\^.*?$", "dart_type_err_3"),
    (("dart_type_err_3",), r"^$", "dart_type_err_4"),
    (("dart_type_err_4",), r"^$", "dart_stack"),
    (("dart_exc",), r"^FormatException", "dart_format_err_1"),
    (("dart_format_err_1",), r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    (("dart_format_err_1",), r"^.", "dart_format_err_2"),
    (("dart_format_err_2",), r"^.*?\^", "dart_format_err_3"),
    (("dart_format_err_3",), r"^$", "dart_stack"),
    (("dart_exc",), r"^NoSuchMethodError:", "dart_method_err_1"),
    (("dart_method_err_1",), r"^Receiver:", "dart_method_err_2"),
    (("dart_method_err_2",), r"^Tried calling:", "dart_method_err_3"),
    (("dart_method_err_3",), r"^Found:", "dart_stack"),
    (("dart_method_err_3",), r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    (("dart_stack",), r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    (("dart_stack",), r"^<asynchronous suspension>$", "dart_stack"),
]

_BY_STATE: dict = {}
for _froms, _rx, _to in _FSM_TABLE:
    creg = _re.compile(_rx)
    for _f in _froms:
        _BY_STATE.setdefault(_f, []).append((creg, _to))

START = "start_state"


class SmartMultiLine:
    """The per-stream FSM driver. ``is_start(line)`` returns whether the
    line begins a new record (smart-multi-line.c accumulate semantics:
    non-trace lines are standalone records; a trace line starting a new
    trace while one is open rewinds/extracts the previous one)."""

    def __init__(self) -> None:
        self.state = START

    def _transition(self, line: str) -> bool:
        for creg, to in _BY_STATE.get(self.state, ()):
            if creg.search(line):
                self.state = to
                return True
        self.state = START
        return False

    def is_start(self, line: str) -> bool:
        last_ended = self.state == START
        part = self._transition(line)
        if not part:
            # retry from start_state: the line may begin a NEW trace
            part = self._transition(line)
            return True  # either standalone or a fresh trace head
        return last_ended


def smart_start_flags(
    df: DataFrame,
    key: list[str],
    order_by: str,
    text_col: str = "text",
    flag_col: str = "_smart_start",
) -> DataFrame:
    """Add ``flag_col`` marking record-start lines per ``key`` stream in
    ``order_by`` order — one sequential Arrow pass per stream, then the
    caller's assembly stays fully distributed."""
    out_cols = list(df.columns) + [flag_col]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{flag_col} boolean"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by).reset_index(drop=True)
        fsm = SmartMultiLine()
        pdf[flag_col] = [
            fsm.is_start("" if t is None else str(t)) for t in pdf[text_col]
        ]
        return pdf[out_cols]

    return df.groupBy(*key).applyInPandas(fn, schema)
