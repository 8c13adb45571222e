"""Repetition signals for training-data quality filtering (the
"Gopher rules" family: Rae et al. 2021, table A1 — duplicate-line
fractions and n-gram repetition fractions).

Signals per document:
  - ``dup_line_frac``        occurrences of duplicated lines / lines
  - ``dup_line_char_frac``   chars in duplicated lines / line chars
  - ``top_{n}gram_char_frac``  chars covered by the single most frequent
                               word n-gram (count × gram length) / chars
  - ``dup_{n}gram_char_frac``  char mass of word n-grams occurring more
                               than once / char mass of ALL n-grams
                               (mass = count × gram length)

Documented divergence from the paper: the dup-n-gram fraction is the
duplicated share of total n-gram char MASS rather than the paper's
positional "characters covered by" — overlapping grams double-count in
both numerator and denominator, so the ratio stays a true [0, 1]
fraction without clamping (dividing the overlap-inflated mass by
text length, as a literal reading of the paper suggests, saturates at
1.0 on any boilerplate-heavy document and destroys the signal). The
ordering of documents by repetition is preserved; the formula is
exactly reproducible in one SQL aggregate, which is what makes the
gate oracle possible.

Spark shape (100-TB-ready): every signal is DOCUMENT-LOCAL, so the
default ``engine="arrow"`` computes all of them in ONE vectorized
pandas-UDF pass — zero shuffles, zero joins, per-task memory bounded
by one document's distinct-gram set. The alternative
``engine="explode"`` is the pure-JVM formulation (explode → count-keyed
groupBy → join back per n); it shuffles (doc_id, 8-byte gram hash,
4-byte length) triples — small rows, but the shuffled row COUNT is the
corpus token mass × len(ns), which at 100 TB is ~10^13 rows per n
versus none at all for the arrow path. The two engines are
identical-results tested (tests/test_repetition.py); the explode path
remains both the cross-check and the fallback if Arrow is unavailable.

Reference framing: syslog-ng's closest analogue is grouping-by()'s
context aggregates (modules/grouping-by) — per-key bag statistics —
with the key being the document itself.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.operators.decontaminate import word_ngrams

# Mirrors the JVM tokenizer used by the explode engine and the DuckDB
# oracle: Java \s is the ASCII class [ \t\n\x0B\f\r] (NOT Unicode-aware
# like Python's \s), so spell it out.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _doc_signals(
    text: str | None,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    all_ns: tuple[int, ...],
) -> list[float]:
    """All repetition fractions for one document, exactly mirroring the
    explode-engine / DuckDB-oracle arithmetic (same tie-breaks, same
    integer→double divisions)."""
    out = []
    if not text:
        return [0.0] * (2 + len(top_ns) + len(dup_ns))

    # line family: split on \n, keep lines with any non-space char
    # (Spark trim() strips 0x20 only — use strip(' '), not strip()).
    lc = Counter(l for l in text.split("\n") if l.strip(" ") != "")
    tot = sum(lc.values())
    tot_chars = sum(c * len(l) for l, c in lc.items())
    out.append(sum(c for c in lc.values() if c > 1) / tot if tot else 0.0)
    out.append(
        sum(c * len(l) for l, c in lc.items() if c > 1) / tot_chars
        if tot_chars
        else 0.0
    )

    n_chars = len(text)
    toks = [t for t in _JAVA_WS.split(text.lower()) if t]
    tops: dict[int, float] = {}
    dups: dict[int, float] = {}
    for n in all_ns:
        if len(toks) < n:
            tops[n] = 0.0
            dups[n] = 0.0
            continue
        # gram identity = the token window; gram length = the length of
        # the space-joined string: sum(len(tok)) + (n - 1) separators
        gc = Counter(zip(*(toks[i:] for i in range(n))))
        if n in top_ns:
            c, gl = max(
                (c, sum(map(len, g)) + n - 1) for g, c in gc.items()
            )
            tops[n] = min(1.0, c * gl / n_chars) if n_chars else 0.0
        if n in dup_ns:
            tot_mass = dup_mass = 0
            for g, c in gc.items():
                gl = sum(map(len, g)) + n - 1
                tot_mass += c * gl
                if c > 1:
                    dup_mass += c * gl
            dups[n] = dup_mass / tot_mass if tot_mass else 0.0
    return out + [tops[n] for n in top_ns] + [dups[n] for n in dup_ns]


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    engine: str = "arrow",
) -> DataFrame:
    """Annotate ``df`` with per-document repetition fractions.

    Adds ``dup_line_frac``, ``dup_line_char_frac``, and per-n
    ``top_{n}gram_char_frac`` / ``dup_{n}gram_char_frac`` columns
    (doubles in [0, 1], 0.0 for empty/too-short documents).

    ``engine="arrow"`` (default) is one zero-shuffle vectorized pass;
    ``engine="explode"`` is the pure-JVM explode/groupBy/join
    formulation (identical results, used as the cross-check).
    """
    if engine == "explode":
        return _stats_explode(df, text_col, id_col, top_ns, dup_ns)
    if engine != "arrow":
        raise ValueError(f"unknown engine {engine!r}")

    top_ns = tuple(top_ns)
    dup_ns = tuple(dup_ns)
    all_ns = tuple(sorted(set(top_ns) | set(dup_ns)))
    names = (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top_ns]
        + [f"dup_{n}gram_char_frac" for n in dup_ns]
    )
    schema = ", ".join(f"{c} double" for c in names)

    def _batch(texts: pd.Series) -> pd.DataFrame:
        rows = [_doc_signals(t, top_ns, dup_ns, all_ns) for t in texts]
        return pd.DataFrame(rows, columns=names, dtype="float64")

    sig = F.pandas_udf(_batch, returnType=schema)
    out = df.withColumn("_rep", sig(F.col(text_col)))
    for c in names:
        out = out.withColumn(c, F.col("_rep")[c])
    return out.drop("_rep")


def _stats_explode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
) -> DataFrame:
    text = F.col(text_col)
    n_chars = F.length(text)

    # --- line family: one explode + count-keyed aggregate ------------
    lines = df.select(
        id_col,
        F.explode(
            F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
        ).alias("_line"),
    )
    line_counts = lines.groupBy(id_col, "_line").agg(F.count("*").alias("_c"))
    line_stats = line_counts.groupBy(id_col).agg(
        (
            F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0))
            / F.sum("_c")
        ).alias("dup_line_frac"),
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("_c") > 1, F.col("_c") * F.length("_line"))
                ),
                F.lit(0),
            )
            / F.sum(F.col("_c") * F.length("_line"))
        ).alias("dup_line_char_frac"),
    )

    # --- n-gram families: explode hashed grams, count, aggregate -----
    def ngram_stats(n: int) -> DataFrame:
        grams = df.select(
            id_col,
            F.explode(word_ngrams(text, n)).alias("_g"),
        ).select(
            id_col,
            F.xxhash64("_g").alias("_gh"),
            F.length("_g").alias("_gl"),
        )
        counts = grams.groupBy(id_col, "_gh", "_gl").agg(
            F.count("*").alias("_c")
        )
        return counts.groupBy(id_col).agg(
            F.max(F.struct("_c", "_gl")).alias(f"_top{n}"),
            F.coalesce(
                F.sum(F.when(F.col("_c") > 1, F.col("_c") * F.col("_gl"))),
                F.lit(0),
            ).alias(f"_dup{n}"),
            F.sum(F.col("_c") * F.col("_gl")).alias(f"_tot{n}"),
        )

    out = df.join(line_stats, id_col, "left")
    for n in sorted(set(top_ns) | set(dup_ns)):
        out = out.join(ngram_stats(n), id_col, "left")

    out = out.withColumn(
        "dup_line_frac", F.coalesce("dup_line_frac", F.lit(0.0))
    ).withColumn(
        "dup_line_char_frac", F.coalesce("dup_line_char_frac", F.lit(0.0))
    )
    for n in top_ns:
        top = F.col(f"_top{n}")
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.when(
                top.isNotNull() & (n_chars > 0),
                F.least(
                    F.lit(1.0), top["_c"] * top["_gl"] / n_chars
                ),
            ).otherwise(F.lit(0.0)),
        )
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.when(
                F.col(f"_tot{n}").isNotNull() & (F.col(f"_tot{n}") > 0),
                F.col(f"_dup{n}") / F.col(f"_tot{n}"),
            ).otherwise(F.lit(0.0)),
        )
    all_ns = sorted(set(top_ns) | set(dup_ns))
    drop = (
        [f"_top{n}" for n in all_ns]
        + [f"_dup{n}" for n in all_ns]
        + [f"_tot{n}" for n in all_ns]
    )
    return out.drop(*drop)


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_ngram_char_frac: dict[int, float] | None = None,
    max_dup_ngram_char_frac: dict[int, float] | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Drop documents exceeding the paper's repetition thresholds
    (defaults: Rae et al. 2021 table A1). Pass dicts {n: threshold} to
    override the per-n limits."""
    top = max_top_ngram_char_frac or {2: 0.20, 3: 0.18, 4: 0.16}
    dup = max_dup_ngram_char_frac or {
        5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10
    }
    stats = repetition_stats(
        df, text_col=text_col, id_col=id_col,
        top_ns=tuple(top), dup_ns=tuple(dup), engine=engine,
    )
    conds = [
        F.col("dup_line_frac") <= max_dup_line_frac,
        F.col("dup_line_char_frac") <= max_dup_line_char_frac,
    ]
    conds += [F.col(f"top_{n}gram_char_frac") <= t for n, t in top.items()]
    conds += [F.col(f"dup_{n}gram_char_frac") <= t for n, t in dup.items()]
    keep = reduce(lambda a, b: a & b, conds)
    extra = (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top]
        + [f"dup_{n}gram_char_frac" for n in dup]
    )
    return stats.filter(keep).drop(*extra)
