"""Unicode text normalization for corpus curation: NFC/NFKC/NFD/NFKD
canonicalization, control-character stripping, whitespace collapsing.

Dedup and fingerprinting (operators/dedup.py, textstats.fingerprint)
treat byte-distinct strings as distinct — decomposed 'cafe' + combining
accent vs precomposed 'café' would defeat exact dedup. This pass
canonicalizes first, the standard first stage of a pre-training text
pipeline.

Execution: Spark has no built-in Unicode-normalization expression, so
this is the documented Arrow path — a vectorized pandas UDF
(``unicodedata.normalize`` over Arrow batches, no per-row Python).
Everything else (control strip, whitespace collapse, trim, lowercase)
stays in pure-Column regexp_replace and composes with the UDF in one
projection; there is no shuffle anywhere.

Parity notes for the gate oracle (DuckDB ``nfc_normalize``):
- whitespace collapse uses the explicit ASCII class ``[ \\t\\n\\r\\f\\v]+``
  in BOTH engines (Python ``\\s`` is Unicode-aware, RE2 ``\\s`` is
  ASCII — the explicit class removes the divergence; U+00A0 etc. are
  deliberately preserved under NFC);
- control strip removes C0 controls except tab/newline/CR, plus DEL.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"[ \t\n\r\f\v]+"


def _norm_udf(form: str):
    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = True,
    collapse_ws: bool = True,
    lowercase: bool = False,
    target: str | None = None,
) -> DataFrame:
    """Canonicalize ``text_col``: strip control chars → Unicode
    ``form`` → collapse ASCII whitespace runs to one space + trim →
    optional lowercase. ``target`` writes to a new column."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    c: Column = F.col(text_col)
    if strip_control:
        c = F.regexp_replace(c, _CONTROL_RE, "")
    # ASCII fast path: octet_length == length ⇔ pure ASCII, and every
    # normal form is the identity on ASCII. A CASE around a Python UDF
    # would NOT skip it (Catalyst extracts UDFs into an unconditional
    # ArrowEvalPython), so instead the UDF INPUT is nulled for ASCII
    # rows — they ship as Arrow nulls (no string payload, no Python
    # work) and coalesce back to the untouched column.
    non_ascii = F.octet_length(c) != F.length(c)
    c = F.coalesce(_norm_udf(form)(F.when(non_ascii, c)), c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, _WS_RE, " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(target or text_col, c)


# HTML extraction chain: order matters and is part of the contract —
# containers whose CONTENT must go (script/style) before comments,
# comments before generic tags (a commented-out tag must not survive),
# entities after tags (so '&lt;b&gt;' decodes to literal '<b>' text
# instead of becoming a strippable tag), '&amp;' strictly last (no
# double-decode: '&amp;lt;' → '&lt;' stays literal).
_HTML_KILL_CONTENT_RE = (
    r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>"
)
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_HTML_TAG_RE = r"(?s)<[^>]*>"
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST
)


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    target: str | None = None,
    decode_entities: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Extract visible text from HTML markup: drop script/style bodies,
    comments and tags (tags become one space so adjacent words never
    fuse), decode the common named/numeric entities, collapse
    whitespace. The first stage of any web-crawl curation pipeline.

    Pure-Column regexp_replace chain — zero shuffle, whole-stage
    codegen, and (deliberately) only regex constructs with identical
    Java/RE2 semantics (non-greedy, inline (?is)) so the DuckDB gate
    oracle replays the exact chain. Not an HTML5 parser: unclosed
    ``<script`` without a terminator survives as text, CDATA is not
    special-cased — the 100-TB contract is bounded-cost single-pass
    extraction, not spec-complete parsing (a spec parser would be a
    mapInPandas stage feeding this same chain).
    """
    c: Column = F.col(text_col)
    c = F.regexp_replace(c, _HTML_KILL_CONTENT_RE, " ")
    c = F.regexp_replace(c, _HTML_COMMENT_RE, " ")
    c = F.regexp_replace(c, _HTML_TAG_RE, " ")
    if decode_entities:
        for ent, repl in _HTML_ENTITIES:
            c = F.replace(c, F.lit(ent), F.lit(repl))
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, _WS_RE, " "))
    return df.withColumn(target or text_col, c)
