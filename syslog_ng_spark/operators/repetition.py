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

Spark shape (100-TB-ready): one explode → groupBy per signal family,
shuffling only (doc_id, 8-byte gram hash, 4-byte length) triples — the
gram STRINGS never enter a shuffle. All ratios are computed map-side
after one partial-aggregated count; no window functions, no driver
state. This is the same count-keyed shape as exact_dedup
(operators/dedup.py) applied within-document instead of across.

Reference framing: syslog-ng's closest analogue is grouping-by()'s
context aggregates (modules/grouping-by) — per-key bag statistics —
with the key being the document itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.operators.decontaminate import word_ngrams


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Annotate ``df`` with per-document repetition fractions.

    Adds ``dup_line_frac``, ``dup_line_char_frac``, and per-n
    ``top_{n}gram_char_frac`` / ``dup_{n}gram_char_frac`` columns
    (doubles in [0, 1], 0.0 for empty/too-short documents).
    """
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
        top_ns=tuple(top), dup_ns=tuple(dup),
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
