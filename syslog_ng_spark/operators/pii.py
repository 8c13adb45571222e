"""PII scrubbing for training-data pipelines: replace emails, IPs,
phone numbers, SSNs and card numbers with typed placeholder tokens.

The generalization of the reference's credit-card-mask SCL rewrite
(scl/rewrite/cc-mask.conf → operators/rewrite.py credit_card_mask):
the same subst() machinery, widened to the standard pre-training scrub
set and kept entirely in pure Column regexp_replace chains — JVM-side,
whole-stage-codegen, zero shuffle, no UDF.

Pattern notes (deliberately conservative, all RE2-compatible so the
DuckDB gate oracle can run the IDENTICAL expressions):
- no lookarounds/backreferences (RE2 has none);
- \\d is ASCII in both engines;
- application ORDER matters (an SSN also looks like a phone number) —
  ``scrub order: email, ssn, cc, ipv4, ipv6, phone`` is fixed and
  mirrored in the oracle;
- false positives are accepted by design (a phone-shaped product code
  gets masked) — pre-training scrubs prefer recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement), applied in this order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "cc": (r"\b(?:\d[ -]?){12,15}\d\b", "<CC>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ipv6": (r"\b(?:[0-9a-fA-F]{1,4}:){2,7}[0-9a-fA-F]{1,4}\b", "<IP6>"),
    "phone": (
        r"\+\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}",
        "<PHONE>",
    ),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
    target: str | None = None,
) -> DataFrame:
    """Replace each PII kind with its placeholder, in the fixed scrub
    order. ``kinds`` selects a subset (order still taken from
    PII_PATTERNS); ``target`` writes to a new column instead of
    overwriting ``text_col``."""
    out = F.col(text_col)
    for kind, (pat, repl) in PII_PATTERNS.items():
        if kinds is not None and kind not in kinds:
            continue
        if kind == "email":
            # a match REQUIRES '@': the email regex dominates the chain
            # (~4× the other kinds — heavy backtracking on every alnum
            # run), and a JVM contains() is a plain substring scan, so
            # @-free rows skip it entirely (lazy CASE branch)
            out = F.when(
                out.contains("@"), F.regexp_replace(out, pat, repl)
            ).otherwise(out)
            continue
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(target or text_col, out)


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-row match counts (``n_email``, ``n_ipv4``, ...) BEFORE
    scrubbing — audit/reporting companion to pii_scrub. Counts are
    taken in scrub order on the progressively scrubbed text, so a
    match counted by one kind is never double-counted by a later one
    (mirrors what pii_scrub would actually replace)."""
    cur: Column = F.col(text_col)
    out = df
    for kind, (pat, repl) in PII_PATTERNS.items():
        if kinds is not None and kind not in kinds:
            continue
        # size(regexp_extract_all(NULL)) is -1 under legacy sizeOfNull
        # (our ANSI-off sessions) and NULL under ANSI — clamp both to 0
        # so aggregations over the audit columns don't silently skip or
        # skew on null-text rows
        out = out.withColumn(
            f"n_{kind}",
            F.coalesce(
                F.greatest(
                    F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))),
                    F.lit(0),
                ),
                F.lit(0),
            ),
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out
