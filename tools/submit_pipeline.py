"""spark-submit entrypoint for the transcript pipeline (the north rule's
deployment shape: `spark-submit --py-files` on a multi-executor cluster).

Build + submit:

    cd /root/repo && zip -qr /tmp/syslog_ng_spark.zip syslog_ng_spark
    spark-submit --master <cluster> \
        --py-files /tmp/syslog_ng_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3x cores> \
        --conf spark.sql.adaptive.enabled=true \
        tools/submit_pipeline.py \
        --input  s3://bucket/transcripts \
        --output s3://bucket/sinks \
        [--metrics s3://bucket/metrics] \
        [--config pipeline.json]

Without --config, the default pipeline is the flagship route: syslog+kv
parse -> severity(final) / tool==bash / fallback sinks. With --config, a
declarative spec (plans/config.py grammar: filters/parsers/rewrites/paths)
is compiled instead — the syslog-ng.conf analogue.

The script prints ONE JSON line with per-sink egress counts so cluster
drivers can assert routed-row parity, and writes per-partition lineage +
throughput markers next to the sinks (resumable-checkpoint contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="transcripts table path")
    ap.add_argument("--output", required=True, help="sink base path")
    ap.add_argument("--metrics", default=None, help="metrics table path")
    ap.add_argument("--config", default=None, help="declarative pipeline spec (json)")
    ap.add_argument("--format", default="parquet")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("syslog_ng_spark.pipeline").getOrCreate()
    # engine-required confs (see session.get_spark): lax casts, last-wins
    # kv keys, UTC — runtime-settable, so they apply under any master
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from syslog_ng_spark.functions import filters as FL
    from syslog_ng_spark.operators import parsers
    from syslog_ng_spark.plans import LogPath, Pipeline
    from syslog_ng_spark.sources.io import read_transcripts

    t0 = time.time()
    df = read_transcripts(spark, args.input)

    if args.config:
        from syslog_ng_spark.plans.config import compile_config

        with open(args.config, encoding="utf-8") as fh:
            spec = json.load(fh)
        routed = compile_config(spec).route(df)
    else:
        enriched = parsers.kv_parser(parsers.syslog_parser(df), source="msg")
        pipe = Pipeline(
            [
                LogPath(
                    "security",
                    FL.FSeverity("err..emerg") & FL.FRaw(F.col("syslog_matched")),
                    frozenset(["final"]),
                ),
                LogPath("bash", F.col("tool") == "bash"),
                LogPath("other", None, frozenset(["fallback"])),
            ]
        )
        routed = pipe.route(enriched)

    routed.write_sinks(args.output, fmt=args.format)
    if args.metrics:
        routed.write_metrics(args.metrics)
    counts = {
        r["path"]: r["route_egress_total"]
        for r in routed.metrics().select("path", "route_egress_total").collect()
    }
    wall = time.time() - t0
    total = sum(counts.values())
    print(
        json.dumps(
            {
                "per_sink_counts": counts,
                "rows": total,
                "sec": round(wall, 3),
                "rows_per_sec": round(total / wall, 1) if wall > 0 else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
