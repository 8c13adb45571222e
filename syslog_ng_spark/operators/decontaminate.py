"""Benchmark decontamination: flag/drop training documents that share
word n-grams with a benchmark/eval set.

The standard LLM training-data hygiene pass (13-gram overlap in GPT-3's
appendix; exact-substring variants elsewhere): any document whose text
contains an n-gram that also appears in the benchmark set is
"contaminated" and must be dropped (or have the overlap reported) before
training.

Spark shape (100-TB-ready):
- The CORPUS side never shuffles AND never materializes gram strings:
  each token is hashed once, each gram key is one ``xxhash64`` over its
  n token hashes (pure long arithmetic in the scan), and the per-doc
  distinct happens inside the row via ``array_distinct`` on longs — no
  exchange, no ~80-byte shingle strings anywhere.
- The BENCHMARK side is small by nature (eval sets are MBs, not TBs):
  its distinct gram keys are broadcast, so the corpus-side membership
  probe is a map-side broadcast semi join. The only rows that ever
  reach a shuffle are the MATCHED grams (near zero on a clean corpus),
  counted per doc and broadcast-joined back.
- 64-bit keys admit collisions at ~n²/2⁶⁵; at 10¹² corpus grams the
  expected number of *cross* collisions against a ~10⁷-gram benchmark is
  ≪ 1 — a cross collision only ever ADDS a false overlap, and a
  within-document collision undercounts ``n_grams`` by 1 at the same
  vanishing rate. Callers who need exactness pass ``hash_grams=False``
  (exact gram strings, same zero-corpus-shuffle plan).

Reference framing: this is the same job as syslog-ng's in-list() filter
(modules/add-contextual-data, filter-in-list.c) — membership of a
derived key in a broadcast list — lifted from one key per row to a bag
of n-gram keys per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(c: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (mirrors the
    DuckDB-oracle tokenizer: string_split_regex(lower(text), '\\s+'))."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def word_ngrams(c: Column, n: int) -> Column:
    """Space-joined word n-grams of the text column as array<string>;
    empty array when the document has fewer than n tokens."""
    tk = word_tokens(c)
    return F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rolling_gram_keys(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Add ``_dgrams``: the DISTINCT 64-bit gram keys of ``text_col``.

    Never builds gram strings: each token is hashed once
    (array<long>), then each gram key is one ``xxhash64`` over its n
    token hashes — pure long arithmetic inside the scan, ~10× cheaper
    than slicing + joining + hashing ~80-byte shingle strings, and
    ``array_distinct`` dedups 8-byte longs instead of strings. The
    token-hash array is materialized as a real column FIRST so the
    ``element_at`` calls inside the gram lambda bind an attribute —
    inlining the expression would re-run the tokenizer per element.
    """
    tkh = F.transform(word_tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    df = df.withColumn("_tkh", tkh)
    a = F.col("_tkh")
    keys = F.when(
        F.size(a) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(a, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn("_dgrams", F.array_distinct(keys)).drop("_tkh")


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    min_overlap: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Annotate ``df`` with benchmark n-gram overlap.

    Returns ``df`` plus:
      - ``n_grams``: number of DISTINCT word n-grams in the document
      - ``n_overlap``: how many of those also occur in ``benchmark``
      - ``contaminated``: ``n_overlap >= min_overlap``

    ``benchmark`` is broadcast (eval sets are small). 100-TB shape: the
    corpus side never shuffles — per-document distinct grams come from
    ``array_distinct`` (document-local, no exchange), ``n_grams`` is a
    plain column, and the overlap explode feeds a map-side BROADCAST
    semi join, so the only rows that ever reach a shuffle are the
    MATCHED (contaminated) grams — near zero on a clean corpus. The
    final count-per-doc table has at most one row per contaminated
    document; AQE broadcasts it for the join back.
    """
    bcol = bench_text_col or text_col

    # per-doc distinct grams WITHOUT a shuffle: dedup inside the array.
    # hash_grams keys grams by a 64-bit rolling hash (never builds the
    # gram strings at all); hash_grams=False keeps exact strings.
    if hash_grams:
        df = _rolling_gram_keys(df, text_col, n)
        bench_grams = (
            _rolling_gram_keys(benchmark, bcol, n)
            .select(F.explode("_dgrams").alias("_gk"))
            .distinct()
        )
    else:
        df = df.withColumn(
            "_dgrams", F.array_distinct(word_ngrams(F.col(text_col), n))
        )
        bench_grams = (
            benchmark.select(
                F.explode(word_ngrams(F.col(bcol), n)).alias("_gk")
            ).distinct()
        )
    # explode_OUTER, deliberately: plain explode triggers Catalyst's
    # InferFiltersFromGenerate, which infers `size(grams) > 0`, pushes
    # it below the projections, and INLINES the whole gram-key
    # expression into a non-codegen Filter + the scan's DataFilters —
    # evaluating the tokenizer+hash chain twice per row (measured 25×
    # slower at 1M docs). The outer explode emits one null row per
    # empty-gram doc instead, and the broadcast semi join drops nulls.
    exploded = df.select(id_col, F.explode_outer("_dgrams").alias("_gk"))
    per_doc = (
        exploded.join(F.broadcast(bench_grams), "_gk", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )

    return (
        df.withColumn("n_grams", F.size("_dgrams").cast("long"))
        .drop("_dgrams")
        .join(per_doc, id_col, "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
        .withColumn("contaminated", F.col("n_overlap") >= F.lit(min_overlap))
    )


def decontaminate_filter(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    min_overlap: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Drop contaminated documents; same signature as ``decontaminate``.

    Implemented as a left-ANTI join against the contaminated-id set
    (ids only — 8-byte keys; AQE turns it into a broadcast probe when
    the contaminated set is small, the common case).
    """
    flagged = decontaminate(
        df, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col, min_overlap=min_overlap,
        hash_grams=hash_grams,
    )
    bad_ids = flagged.filter("contaminated").select(id_col)
    return df.join(bad_ids, id_col, "left_anti")
