"""Extra benchmarks + plan capture for the optimization rounds.

NOT part of the frozen measurement contract (bench.py is the driver's
timed artifact — untouched). This harness follows the optimization
guide's measurement rules:

* isolation via the noop sink (guide §1.4): every column of every row is
  computed and discarded, so timings measure the computation, not a
  collect or an output write;
* jobs labelled with setJobDescription (guide §1.5);
* MEDIAN of 3 runs, plan rebuilt per run, clearCache + GC between runs
  (the protocol bench.py uses);
* `.explain("formatted")` capture for the plans/rNN/<query>_{before,after}.txt
  deliverables.

Usage:
  python bench_extra.py --time [query ...]           # noop-sink medians
  python bench_extra.py --plans plans/r07 --tag before [query ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _explain_formatted(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--plans")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from syslog_ng_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()
    names = args.queries or [
        n for n in qs if n not in ("patternize_iter", "stream_route_parity")
    ]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"plan: {name}")
            try:
                df = qs[name](spark, SF_DIR)
                txt = _explain_formatted(df)
            except Exception as e:  # noqa: BLE001
                txt = f"PLAN CAPTURE FAILED: {e!r}"
            path = os.path.join(args.plans, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}")
            spark.catalog.clearCache()
            gc.collect()

    if args.time:
        out: dict[str, float] = {}
        for name in names:
            times = []
            for i in range(args.repeats):
                spark.catalog.clearCache()
                gc.collect()
                spark.sparkContext.setJobDescription(f"noop {name} #{i}")
                t0 = time.time()
                _noop(qs[name](spark, SF_DIR))
                times.append(time.time() - t0)
            out[name] = round(sorted(times)[len(times) // 2], 3)
            print(f"{name:28s} {out[name]:8.3f}s  (runs: {[round(t,3) for t in times]})")
        print(json.dumps({"noop_median3": out, "sf_dir": SF_DIR}))

    spark.stop()


if __name__ == "__main__":
    main()
