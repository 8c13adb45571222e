"""End-to-end engine drive (the /verify recipe): datagen → parse →
route → write_sinks, per-sink count parity vs a plain-Python oracle and
the text-equality invariant. Exit 0 iff everything matches."""

import collections
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark
from syslog_ng_spark.datagen import write_transcripts
from syslog_ng_spark.sources import read_transcripts
from syslog_ng_spark.operators import parsers
from syslog_ng_spark.plans import Pipeline, LogPath


def main():
    spark = get_spark(cpus=8)
    tmp = tempfile.mkdtemp(prefix="verify_drive_")
    write_transcripts(spark, tmp + "/transcripts", n_convs=200, avg_turns=8)
    df = read_transcripts(spark, tmp + "/transcripts")
    enriched = parsers.kv_parser(
        parsers.syslog_parser(df), source="msg"
    ).withColumn(
        "severity_num", F.pmod(F.col("pri").cast("long"), F.lit(8)).cast("int")
    )
    pipe = Pipeline([
        LogPath("errors", F.col("severity_num") <= 3, frozenset(["final"])),
        LogPath(
            "auth", F.col("program").isin("sshd", "sudo"), frozenset(["final"])
        ),
        LogPath("fallback", None, frozenset(["fallback"])),
    ])
    pipe.route(enriched).write_sinks(tmp + "/sinks")

    rows = enriched.collect()
    oracle = collections.Counter()
    for r in rows:
        d = r.asDict()
        matched = False
        if d.get("severity_num") is not None and d["severity_num"] <= 3:
            oracle["errors"] += 1
            matched = True
        if not matched and d.get("program") in ("sshd", "sudo"):
            oracle["auth"] += 1
            matched = True
        if not matched:
            oracle["fallback"] += 1

    src = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    ok = True
    for sink in ("errors", "auth", "fallback"):
        sdf = spark.read.parquet(f"{tmp}/sinks/{sink}")
        n = sdf.count()
        bad = sum(
            1
            for r in sdf.select("conv_id", "turn_idx", "text").collect()
            if src[(r["conv_id"], r["turn_idx"])] != r["text"]
        )
        print(f"{sink}: spark={n} oracle={oracle[sink]} text_bad={bad}")
        ok &= n == oracle[sink] and bad == 0
    print("VERIFY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
