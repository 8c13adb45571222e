"""End-to-end verify drive (.claude/skills/verify recipe): synthetic
transcripts from disk -> parse chain -> final/fallback route -> written
sinks, per-sink count parity vs a plain-Python oracle + text-equality
invariant. Exits nonzero on any mismatch."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark
from syslog_ng_spark.datagen import write_transcripts
from syslog_ng_spark.sources import read_transcripts
from syslog_ng_spark.operators import parsers
from syslog_ng_spark.plans import Pipeline, LogPath


def main() -> int:
    spark = get_spark(app_name="verify", cpus=8, shuffle_partitions=8)
    tmp = tempfile.mkdtemp()
    write_transcripts(spark, tmp + "/transcripts", n_convs=300, avg_turns=10)
    df = read_transcripts(spark, tmp + "/transcripts")
    enriched = parsers.kv_parser(parsers.syslog_parser(df), source="msg")

    pipe = Pipeline([
        LogPath("errors", filter=F.col("pri") % 8 <= 3, flags=["final"]),
        LogPath("kv", filter=F.col("kv_matched"), flags=["final"]),
        LogPath("rest", flags=["fallback"]),
    ])
    routed = pipe.route(enriched)
    routed.write_sinks(tmp + "/sinks")

    rows = enriched.select(
        "conv_id", "turn_idx", "text", "pri", "kv_matched"
    ).collect()
    exp = {"errors": 0, "kv": 0, "rest": 0}
    for r in rows:
        if r["pri"] is not None and r["pri"] % 8 <= 3:
            exp["errors"] += 1
        elif r["kv_matched"]:
            exp["kv"] += 1
        else:
            exp["rest"] += 1

    src_text = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    ok = True
    for name in exp:
        got = spark.read.parquet(tmp + f"/sinks/{name}")
        n = got.count()
        print(f"{name}: sink={n} oracle={exp[name]}"
              f" {'OK' if n == exp[name] else 'MISMATCH'}")
        ok &= n == exp[name]
        for r in got.select("conv_id", "turn_idx", "text").collect():
            if src_text[(r["conv_id"], r["turn_idx"])] != r["text"]:
                print(f"text invariant BROKEN in {name}")
                ok = False
                break
    print("VERIFY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
