"""Round-6 curation additions at 10M documents: strip_html, URL
parse/normalize/eTLD+1, domain_stats, stratified_sample_exact and
group_percentiles — throughput plus exactness invariants at scale.
Run ALONE (one local[32] session owns the machine)."""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

N = 10_000_000
PATH = "/tmp/scale_web/docs"


def build(spark):
    d = spark.range(N).withColumnRenamed("id", "doc_id")
    i = F.col("doc_id")
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(i * 37 + j * 101), F.lit(5000))
            ),
        ),
        " ",
    )
    html = F.concat(
        F.lit('<html><head><script>var x="'),
        (i % 7).cast("string"),
        F.lit('";</script><style>p{}</style></head><body><!-- c'),
        (i % 5).cast("string"),
        F.lit(" --><h1>T"),
        i.cast("string"),
        F.lit('</h1><p class="c">'),
        words,
        F.lit(" &amp; &lt;b&gt;</p><br/>tail</body></html>"),
    )
    sub = F.when(i % 3 == 0, "").when(i % 3 == 1, "www.").otherwise("a.b.")
    dom = F.concat(F.lit("site"), (i % 997).cast("string"))
    suf = F.when(i % 4 == 0, "com").when(i % 4 == 1, "co.uk").when(
        i % 4 == 2, "org"
    ).otherwise("com.au")
    url = F.concat(
        F.lit("HTTP://"), sub, dom, F.lit("."), suf,
        F.when(i % 5 == 0, ":80").otherwise(""),
        F.lit("/p/"), (i % 50).cast("string"),
        F.when(i % 2 == 0, "?a=1").otherwise(""),
        F.when(i % 2 == 1, "#f").otherwise(""),
    )
    lang = F.concat(F.lit("L"), F.pmod(F.xxhash64(i * 13), F.lit(20)).cast("string"))
    d.select(
        "doc_id",
        html.alias("text"),
        url.alias("url"),
        lang.alias("lang"),
        (F.xxhash64(i) % 1000 + 1000).cast("int").alias("n_chars"),
    ).repartition(128).write.mode("overwrite").parquet(PATH)


def main():
    spark = get_spark(cpus=32)
    t0 = time.time()
    build(spark)
    print(f"datagen {N} docs: {time.time()-t0:.1f}s", flush=True)
    docs = spark.read.parquet(PATH)

    from syslog_ng_spark.operators.normalize import strip_html
    from syslog_ng_spark.operators.percentiles import group_percentiles
    from syslog_ng_spark.operators.sampling import stratified_sample_exact
    from syslog_ng_spark.operators.weburl import (
        domain_stats,
        normalize_url,
        registrable_domain,
    )

    # -- strip_html: invariant = extraction equals the closed-form text
    i = F.col("doc_id")
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(i * 37 + j * 101), F.lit(5000))
            ),
        ),
        " ",
    )
    expect = F.concat(
        F.lit("T"), i.cast("string"), F.lit(" "), words, F.lit(' & <b> tail')
    )
    t0 = time.time()
    bad = (
        strip_html(docs, target="ex")
        .filter(F.col("ex") != expect)
        .count()
    )
    dt = time.time() - t0
    print(
        f"strip_html: {N/dt:,.0f} docs/s ({dt:.1f}s), closed-form "
        f"mismatches {bad} (expect 0)",
        flush=True,
    )

    # -- URL parse+normalize+etld1: invariant = per-etld1 counts exact
    t0 = time.time()
    parsed = normalize_url(docs, url_col="url").withColumn(
        "etld1", registrable_domain(F.col("url_host"))
    )
    n_dom = parsed.select("etld1").distinct().count()
    dt = time.time() - t0
    # 1000 dom stems x 4 suffixes, ids cover all 4000 combos
    print(
        f"url normalize+etld1: {N/dt:,.0f} docs/s ({dt:.1f}s), distinct "
        f"etld1 {n_dom} (expect 3988 = 997 stems x 4 suffixes)",
        flush=True,
    )

    t0 = time.time()
    ds = domain_stats(docs, url_col="url", weight_col="n_chars")
    rows = ds.count()
    dt = time.time() - t0
    print(f"domain_stats: {N/dt:,.0f} docs/s ({dt:.1f}s), rows {rows}", flush=True)

    # -- stratified: invariant = prefilter and plain window agree exactly
    t0 = time.time()
    pf = stratified_sample_exact(docs, 1000, strata_col="lang")
    pf_agg = pf.agg(
        F.count("*").alias("n"), F.sum(F.crc32(F.col("doc_id").cast("string"))).alias("h")
    ).collect()[0]
    dt_pf = time.time() - t0
    t0 = time.time()
    pl = stratified_sample_exact(docs, 1000, strata_col="lang", prefilter=False)
    pl_agg = pl.agg(
        F.count("*").alias("n"), F.sum(F.crc32(F.col("doc_id").cast("string"))).alias("h")
    ).collect()[0]
    dt_pl = time.time() - t0
    print(
        f"stratified k=1000x20: prefilter {dt_pf:.1f}s vs full-window "
        f"{dt_pl:.1f}s ({dt_pl/dt_pf:.1f}x); sets equal: "
        f"{tuple(pf_agg) == tuple(pl_agg)} (n={pf_agg['n']}, expect 20000)",
        flush=True,
    )

    # -- stratified with a FAT payload: the prefilter's reason to exist
    # is shuffle volume — ~factor*k rows/stratum cross the wire instead
    # of the corpus. Pad 1 KB per row so the window shuffle is ~10 GB.
    # the sampled output must CONSUME the payload (sum of its bytes),
    # otherwise Catalyst prunes it out of the window shuffle and the
    # comparison is vacuous
    fat_path = "/tmp/scale_web/docs_fat"
    docs.withColumn("pad", F.repeat(F.lit("x"), 1000)).write.mode(
        "overwrite"
    ).parquet(fat_path)
    fat = spark.read.parquet(fat_path)
    consume = [
        F.count("*").alias("n"),
        F.sum(F.octet_length("pad")).alias("pb"),
        F.sum(F.octet_length("text")).alias("tb"),
    ]
    t0 = time.time()
    pf_fat = stratified_sample_exact(fat, 1000, strata_col="lang").agg(
        *consume).collect()[0]["n"]
    dt_pf_fat = time.time() - t0
    t0 = time.time()
    pl_fat = stratified_sample_exact(
        fat, 1000, strata_col="lang", prefilter=False
    ).agg(*consume).collect()[0]["n"]
    dt_pl_fat = time.time() - t0
    print(
        f"stratified 1KB-payload: prefilter {dt_pf_fat:.1f}s vs "
        f"full-window {dt_pl_fat:.1f}s ({dt_pl_fat/dt_pf_fat:.1f}x), "
        f"n {pf_fat}=={pl_fat}",
        flush=True,
    )

    # -- percentiles: approx rank error at 10M within n/accuracy
    t0 = time.time()
    ex = group_percentiles(docs, "n_chars", ["lang"], percentiles=(0.5, 0.99))
    ex_rows = {r["lang"]: r for r in ex.collect()}
    dt_ex = time.time() - t0
    t0 = time.time()
    ap = group_percentiles(
        docs, "n_chars", ["lang"], percentiles=(0.5, 0.99),
        mode="approx", accuracy=10_000,
    )
    ap_rows = {r["lang"]: r for r in ap.collect()}
    dt_ap = time.time() - t0
    # values are uniform over 2000 ints; rank slack n/acc maps to value
    # slack ~ span * (1/acc) * safety 3
    worst = 0.0
    for lang, er in ex_rows.items():
        for lbl in ("p50", "p99"):
            worst = max(worst, abs(er[lbl] - ap_rows[lang][lbl]))
    print(
        f"percentiles 20 groups: exact {dt_ex:.1f}s, approx {dt_ap:.1f}s; "
        f"worst |approx-exact| {worst:.1f} (value slack bound ~{2000/10_000*3*100:.0f})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
