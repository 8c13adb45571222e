"""End-to-end engine drive (the /verify recipe): datagen -> parse ->
route -> write sinks, then per-sink count parity + text-equality vs a
plain-Python oracle, plus the driver-contract smoke (entry())."""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from syslog_ng_spark.datagen import write_transcripts
from syslog_ng_spark.operators import parsers
from syslog_ng_spark.plans import LogPath, Pipeline
from syslog_ng_spark.session import get_spark
from syslog_ng_spark.sources import read_transcripts


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="verify_e2e_")
    spark = get_spark(app_name="verify", cpus=8, shuffle_partitions=8)
    try:
        write_transcripts(spark, tmp + "/transcripts", n_convs=300, avg_turns=10)
        df = read_transcripts(spark, tmp + "/transcripts")
        enriched = parsers.kv_parser(parsers.syslog_parser(df), source="msg")
        pipe = Pipeline([
            LogPath("errors", filter=(F.col("pri") % 8) <= 3, flags=frozenset(["final"])),
            LogPath("tools", filter=F.col("tool").isNotNull() & (F.col("tool") != ""), flags=frozenset(["final"])),
            LogPath("rest", flags=frozenset(["fallback"])),
        ])
        routed = pipe.route(enriched)
        routed.write_sinks(tmp + "/sinks")

        rows = enriched.collect()
        oracle = {"errors": 0, "tools": 0, "rest": 0}
        for r in rows:
            d = r.asDict()
            if d.get("pri") is not None and d["pri"] % 8 <= 3:
                oracle["errors"] += 1
            elif d.get("tool"):
                oracle["tools"] += 1
            else:
                oracle["rest"] += 1

        ok = True
        src_text = {(r.conv_id, r.turn_idx): r.text for r in rows}
        for sink, want in oracle.items():
            got_df = spark.read.parquet(f"{tmp}/sinks/{sink}")
            got = got_df.count()
            if got != want:
                ok = False
            bad = sum(
                1
                for r in got_df.select("conv_id", "turn_idx", "text").collect()
                if src_text[(r.conv_id, r.turn_idx)] != r.text
            )
            if bad:
                ok = False
            print(f"sink {sink}: spark={got} oracle={want} "
                  f"{'OK' if got == want else 'MISMATCH'}; text violations: {bad}")

        import __spark_entry__ as e
        res = e.entry(spark)
        n = res.count()
        print("entry() rows:", n, "schema:", [f.name for f in res.schema.fields])
        print("VERIFY", "PASS" if ok and n >= 0 else "FAIL")
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
