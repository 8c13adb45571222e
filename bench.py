"""Benchmark harness (loggen analogue — reference tests/loggen/loggen.c
prints `average rate = msg/sec`; here the unit is transcript turns
parsed+routed per second).

Protocol (BASELINE.md):
1. Generate a deterministic transcript corpus to parquet (sized by sf).
2. Run the headline parse→filter→route→aggregate job at TWO parallelism
   levels (local[N] and local[4N]) — the sandbox stand-in for N vs 4N
   executors — and report throughput at both + scaling efficiency
   = throughput_4N / (4 × throughput_N).
3. Time every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line; also rewrites BENCH.md with the scaling table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(1, CPUS // 4)
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
# corpus sized so the whole bench stays inside ~6 min wall: sf0.1 → 4M turns
N_CONVS = int(40_000 * SF * 100)


class _HostLoadGuard:
    """Contamination guard (r5 verdict: a bench taken under external host
    load shipped as the round artifact). Samples 1-min loadavg in a
    background thread and, at close, estimates EXTERNAL load as
    mean(loadavg) − own CPU rate (self + children rusage deltas / wall).
    The JSON artifact always carries the numbers; `contaminated` flips
    true when the external estimate exceeds ``threshold`` so a polluted
    run can never silently become the round artifact."""

    def __init__(self, threshold: float = 1.0):
        import resource
        import threading

        self._resource = resource
        self.threshold = threshold
        self.start_load = os.getloadavg()[0]
        self._samples: list[float] = []
        self._stop = threading.Event()
        self._t0 = time.time()
        ru_s = resource.getrusage(resource.RUSAGE_SELF)
        ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
        self._cpu0 = ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime + ru_c.ru_stime
        self._tree0 = self._subtree_cpu()
        self._thread = threading.Thread(target=self._sampler, daemon=True)
        self._thread.start()

    @staticmethod
    def _subtree_cpu() -> dict:
        """Per-pid CPU seconds for every LIVE descendant of this process
        (the Spark JVM above all). RUSAGE_CHILDREN only counts REAPED
        children — the JVM is alive for the whole bench, so without this
        the guard attributed the bench's own work to 'external' load and
        flagged every clean run as contaminated."""
        hz = os.sysconf("SC_CLK_TCK")
        info: dict[int, tuple[int, float]] = {}
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat", "rb") as f:
                    s = f.read().decode("ascii", "replace")
            except OSError:
                continue
            rp = s.rfind(")")
            fields = s[rp + 2 :].split()
            # after comm: [1]=ppid, [11]=utime, [12]=stime (man proc)
            info[int(ent)] = (
                int(fields[1]),
                (int(fields[11]) + int(fields[12])) / hz,
            )
        me = os.getpid()
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in info.items():
            kids.setdefault(ppid, []).append(pid)
        out: dict[int, float] = {}
        stack = list(kids.get(me, []))
        while stack:
            p = stack.pop()
            out[p] = info[p][1]
            stack.extend(kids.get(p, []))
        return out

    def _sampler(self):
        while not self._stop.wait(5.0):
            self._samples.append(os.getloadavg()[0])

    def wait_for_idle(self, max_wait: float = 120.0) -> None:
        """Best-effort: delay the bench start while external load is high
        (refuse-by-waiting; after max_wait proceed and let the artifact
        carry the contamination flag)."""
        waited = 0.0
        while os.getloadavg()[0] > self.threshold and waited < max_wait:
            time.sleep(10.0)
            waited += 10.0
        self.start_load = os.getloadavg()[0]

    def close(self) -> dict:
        self._stop.set()
        self._thread.join(timeout=1.0)
        wall = max(time.time() - self._t0, 1e-6)
        resource = self._resource
        ru_s = resource.getrusage(resource.RUSAGE_SELF)
        ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
        own_cpu = (
            ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime + ru_c.ru_stime
        ) - self._cpu0
        # live (unreaped) descendants — the Spark JVM — aren't in rusage;
        # add their /proc-measured CPU delta (reaped ones left /proc and
        # landed in RUSAGE_CHILDREN, so nothing double-counts)
        for pid, cpu in self._subtree_cpu().items():
            own_cpu += max(0.0, cpu - self._tree0.get(pid, 0.0))
        own_rate = own_cpu / wall
        mean_load = (
            sum(self._samples) / len(self._samples)
            if self._samples
            else os.getloadavg()[0]
        )
        # NOTE: loadavg includes runnable-but-waiting threads of our own
        # JVM during shuffle-heavy phases, so own_rate (CPU actually
        # consumed) slightly UNDERCOUNTS our loadavg share — external_est
        # is a conservative (high) estimate.
        external_est = max(0.0, mean_load - own_rate)
        return {
            "start_loadavg": round(self.start_load, 2),
            "mean_loadavg": round(mean_load, 2),
            "own_cpu_rate": round(own_rate, 2),
            "external_est": round(external_est, 2),
            "threshold": self.threshold,
            "contaminated": bool(
                external_est > self.threshold or self.start_load > self.threshold
            ),
        }


def _pipeline_job(spark, corpus_path):
    """The headline job: read → syslog+kv parse → filter → route → per-sink
    counts. Returns (n_turns, per-sink counts dict)."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions import filters as FL
    from syslog_ng_spark.operators.parsers import kv_parser, syslog_parser
    from syslog_ng_spark.plans import LogPath, Pipeline

    df = spark.read.parquet(corpus_path)
    parsed = kv_parser(syslog_parser(df), source="msg")
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
    routed = pipe.route(parsed, persist=False)
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in pipe.paths:
        aggs.append(F.sum(F.col(f"_deliver_{p.name}").cast("long")).alias(p.name))
    row = routed.df.agg(*aggs).collect()[0]
    return row["n"], {p.name: row[p.name] for p in pipe.paths}


def _parse_job(spark, corpus_path):
    """Full parse: every syslog field forced (no pruning) — the
    'parsing enabled' workload of the reference's README numbers."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.parsers import syslog_parser

    df = spark.read.parquet(corpus_path)
    p = syslog_parser(df)
    row = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("syslog_matched").cast("long")).alias("matched"),
        F.sum("pri"),
        F.sum(F.length("host")),
        F.sum(F.length("msg")),
        F.sum(F.length("program")),
    ).collect()[0]
    return row["n"], {"matched": row["matched"]}


def _run_level(
    cpus: int, corpus_path: str, job, repeats: int = 3, warm_rows: int | None = None
) -> tuple[float, int, dict]:
    """Start a session at local[cpus], warm up, return best-of-N seconds.

    ``warm_rows``: warm JIT/codegen/file-listing on a row-limited slice
    instead of the full corpus — the low-parallelism levels otherwise
    spend 20s+ per warm-up, which is what blew the bench past its ~6-min
    wall budget at 3 scaling rounds."""
    from syslog_ng_spark.session import get_spark

    spark = get_spark(app_name=f"bench{cpus}", cpus=cpus, shuffle_partitions=cpus)
    try:
        if warm_rows is not None:
            from pyspark.sql import functions as F

            from syslog_ng_spark.operators.parsers import syslog_parser

            slice_df = spark.read.parquet(corpus_path).limit(warm_rows)
            syslog_parser(slice_df).agg(
                F.sum(F.col("syslog_matched").cast("long")), F.sum("pri")
            ).collect()
        else:
            job(spark, corpus_path)  # warm-up (JIT, file listing)
        best = float("inf")
        n, sinks = 0, {}
        for _ in range(repeats):  # best-of-N: JIT/GC session noise is ~25%
            t0 = time.time()
            n, sinks = job(spark, corpus_path)
            best = min(best, time.time() - t0)
        return best, n, sinks
    finally:
        spark.stop()


def main() -> None:
    from syslog_ng_spark.datagen import write_transcripts
    from syslog_ng_spark.session import get_spark

    guard = _HostLoadGuard(threshold=1.0)
    if guard.start_load > guard.threshold:
        print(
            f"bench: external loadavg {guard.start_load:.1f} > "
            f"{guard.threshold} — waiting for idle host",
            file=sys.stderr,
        )
        guard.wait_for_idle()

    work = tempfile.mkdtemp(prefix="bench_corpus_")
    corpus = f"{work}/transcripts"

    import __spark_entry__ as entrymod

    # --- generate corpus + time the query suite at full parallelism --------
    spark = get_spark(app_name="bench_gen", cpus=CPUS)
    write_transcripts(
        spark, corpus, n_convs=N_CONVS, avg_turns=10, hot_convs=3, hot_factor=200,
        partitions=CPUS * 2,
    )
    qtimes: dict[str, float] = {}
    import gc

    # warm MLlib class-loading/JIT on a 4-row fit so the ivf query's
    # timing measures the operator, not first-use framework loading
    # (~10s of one-time cost otherwise lands on whichever query is first)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    _warm = spark.createDataFrame(
        [([float(i), 0.0],) for i in range(4)], "v array<double>"
    ).select(array_to_vector("v").alias("f"))
    KMeans(k=2, seed=1, maxIter=1, featuresCol="f").fit(_warm)

    def _isolate():
        # isolate runs: drop lingering caches and run finalizer-based
        # unpersists NOW — cross-talk otherwise swings the heavy
        # near-dup queries 4× between runs
        gc.collect()
        spark.catalog.clearCache()

    def _median3(thunk, isolate: bool = True) -> float:
        # MEDIAN of 3 runs, plan REBUILT per run (thunk constructs the
        # DataFrame fresh each call): single-shot timings in a shared
        # session drift up to 2× with session state (r3's flagship_route
        # printed +262% while the same pipeline's fresh-session headline
        # moved −11%); the median of fresh plans is adjudicable.
        times = []
        for _ in range(3):
            if isolate:
                _isolate()
            else:
                gc.collect()
            t0 = time.time()
            thunk()
            times.append(time.time() - t0)
        return round(sorted(times)[1], 3)

    for name, fn in entrymod.queries().items():
        if name == "patternize_iter":
            # correctness gate for the outlier re-mine LOOP over a fixed
            # 500-line planted corpus: its wall time is per-round job +
            # checkpoint overhead, not operator throughput (the
            # 'patternize' query times the mining operator properly).
            continue
        if name == "stream_route_parity":
            # correctness gate, not a throughput query: its wall time is
            # streaming-checkpoint machinery (availableNow trigger +
            # commit log) over a fixed tiny corpus — timing it 3× would
            # burn ~1 min of the bench budget measuring the state store.
            # The routed-throughput headline below times the same
            # pipeline properly.
            continue
        if name == "ivf_topk" and hasattr(entrymod, "ivf_bench_phases"):
            # index construction is one-time/amortized at 100 TB — report
            # build and probe as separate numbers (VERDICT r3 item 4)
            build, probe = entrymod.ivf_bench_phases(spark, SF_DIR)
            _isolate()
            t0 = time.time()
            build()
            qtimes["ivf_index_build"] = round(time.time() - t0, 3)
            # probe runs against the persisted index (clearCache would
            # drop it and re-time the build) — the recurring query cost
            qtimes[name] = _median3(probe, isolate=False)
            _isolate()
            continue
        qtimes[name] = _median3(lambda f=fn: f(spark, SF_DIR).collect())
    spark.stop()

    # --- throughput: routed-count job at full parallelism -------------------
    t_route, n_turns, sinks = _run_level(CPUS, corpus, _pipeline_job)
    thr_route = n_turns / t_route

    # --- N→4N scaling criterion on the full-parse job ----------------------
    # Measured at local[2] vs local[8] — the cross-executor analogue: on a
    # real cluster each added executor brings its own memory bandwidth,
    # matching the non-saturated regime of this single host. Above ~12
    # threads one host's memory bus saturates for string-heavy parsing
    # (pure-compute scales ~21×/32 procs here), so higher thread pairs
    # measure the bus, not the engine (full curve recorded in SCALE.md).
    N_LO, N_HI = max(1, CPUS // 16), max(1, CPUS // 4)
    # Host noise drifts between sessions, so the lo/hi pair is measured in
    # INTERLEAVED rounds and the efficiency comes from the best round —
    # drift cancels within a round, not across a 5-minute gap.
    rounds = []
    parse_runs = {}
    n_parse = None
    for _ in range(3):  # 3 rounds: a single noisy lo/hi pair (~±25%
        # session drift) otherwise decides the reported efficiency
        lo = _run_level(N_LO, corpus, _parse_job, repeats=1, warm_rows=200_000)
        hi = _run_level(N_HI, corpus, _parse_job, repeats=2, warm_rows=200_000)
        assert lo[1] == hi[1], "parity across levels"
        n_parse = lo[1]
        rounds.append((lo[0], hi[0]))
        if N_LO not in parse_runs or lo[0] < parse_runs[N_LO][0]:
            parse_runs[N_LO] = lo
        if N_HI not in parse_runs or hi[0] < parse_runs[N_HI][0]:
            parse_runs[N_HI] = hi
    thr_parse = {lv: n_parse / parse_runs[lv][0] for lv in parse_runs}
    per_round = [round(t_lo / t_hi / (N_HI / N_LO), 3) for t_lo, t_hi in rounds]
    # headline = MEDIAN of the rounds (best-of-N on a ratio with ~±25%
    # session drift systematically overstates it); clamp at 1.0 only as a
    # sanity bound — a superlinear round is the measurement lying, not
    # the engine beating ideal scaling. Raw rounds stay in the output.
    efficiency = min(1.0, sorted(per_round)[len(per_round) // 2])

    result = {
        "metric": "transcript_turns_parsed_routed_per_sec",
        "value": round(thr_route, 1),
        "unit": "rows/sec",
        "queries": qtimes,
        "sf": SF,
        "pipeline": {
            "n_turns": n_turns,
            "per_sink_counts": sinks,
            "route_job": {f"local[{CPUS}]": {"sec": round(t_route, 3), "rows_per_sec": round(thr_route, 1)}},
            "full_parse_job": {
                f"local[{lv}]": {
                    "sec": round(parse_runs[lv][0], 3),
                    "rows_per_sec": round(thr_parse[lv], 1),
                }
                for lv in parse_runs
            },
            "scaling_pair": f"local[{N_LO}] -> local[{N_HI}]",
            "scaling_efficiency": efficiency,
            "scaling_rounds": per_round,
        },
        "host_load": guard.close(),
    }
    shutil.rmtree(work, ignore_errors=True)

    write_bench_md(result)
    print(json.dumps(result))


def write_bench_md(result: dict) -> None:
    """Render BENCH.md from a bench result dict. Also reachable via
    `python bench.py --report <result.json>` to regenerate the report
    without re-measuring."""
    repo = os.path.dirname(os.path.abspath(__file__))
    pipe = result["pipeline"]
    (route_level, route_stats), = pipe["route_job"].items()
    rows = "\n".join(
        f"| {lv} | {st['sec']:.3f} | {st['rows_per_sec']:,.0f} |"
        for lv, st in pipe["full_parse_job"].items()
    )

    # per-query delta vs the previous round, when its JSON is around
    prev_q, prev_name = {}, None
    for cand in sorted(
        f for f in os.listdir(repo) if f.startswith("BENCH_r") and f.endswith(".json")
    ):
        try:
            with open(os.path.join(repo, cand)) as fh:
                prev = json.load(fh)
            prev = prev.get("parsed", prev)  # driver wraps under "parsed"
            if prev.get("queries") and prev["queries"] != result["queries"]:
                prev_q, prev_name = prev["queries"], cand
        except (OSError, ValueError):
            continue
    cmp_section = ""
    if prev_q:
        lines = []
        for q, sec in result["queries"].items():
            p = prev_q.get(q)
            delta = f"{(sec / p - 1) * 100:+.0f}%" if p else "new"
            lines.append(f"| {q} | {p if p is not None else '—'} | {sec} | {delta} |")
        cmp_section = (
            f"\n## Per-query seconds at sf={result['sf']} (vs {prev_name})\n\n"
            "This round: MEDIAN of 3 runs per query, plan rebuilt per run, "
            "clearCache + GC between runs (rounds ≤ r3 were single-shot — "
            "their numbers carry up-to-2× session drift; trust direction "
            "only). ivf_index_build is reported separately from the "
            "ivf_topk probe.\n\n"
            f"| query | prev s | now s | Δ |\n|---|---|---|---|\n" + "\n".join(lines) + "\n"
        )

    # Preserve any hand-written adjudication section (delimited by the
    # marker below) across regenerations — measured numbers are machine
    # truth, but the WHY behind a delta is written by a human per round.
    marker = "<!-- adjudications -->"
    manual = ""
    md_path = os.path.join(repo, "BENCH.md")
    try:
        with open(md_path) as fh:
            old = fh.read()
        if marker in old:
            manual = "\n" + old[old.index(marker):].rstrip() + "\n"
    except OSError:
        pass

    with open(md_path, "w") as fh:
        fh.write(
            "# BENCH — measured locally by bench.py\n\n"
            f"Corpus: {pipe['n_turns']:,} turns (deterministic datagen, seed 42), "
            "shuffle.partitions = cores, AQE on.\n\n"
            "## Headline: parse+route+count\n\n"
            "read parquet → syslog parse → severity filter → 3-sink route "
            "(final/fallback) → per-sink counts (Catalyst prunes parsing to "
            "the columns routing needs — that pruning is the point):\n\n"
            f"**{result['value']:,.0f} turns/s** at {route_level} "
            f"(reference single-node relay: 600-800k msg/s, README.md:91-93).\n\n"
            + (
                (
                    lambda hl: (
                        f"Host-load guard: start loadavg {hl['start_loadavg']}, "
                        f"mean {hl['mean_loadavg']}, own CPU rate "
                        f"{hl['own_cpu_rate']}, external estimate "
                        f"{hl['external_est']} (threshold {hl['threshold']}) — "
                        + (
                            "**CONTAMINATED — do not adjudicate against this "
                            "run**.\n\n"
                            if hl["contaminated"]
                            else "clean.\n\n"
                        )
                    )
                )(result["host_load"])
                if result.get("host_load")
                else ""
            )
            + "## N→4N scaling criterion (full-parse job, every field forced)\n\n"
            f"| level | wall s | turns/s |\n|---|---|---|\n{rows}\n\n"
            f"**Scaling efficiency {pipe['scaling_pair']} = "
            f"{pipe['scaling_efficiency']:.3f}** (target ≥ 0.8, BASELINE.json; "
            f"MEDIAN of interleaved rounds {pipe['scaling_rounds']}, clamped "
            "at 1.0 as a sanity bound).\n\n"
            "Host-noise caveat: repeated clean runs of this bench on this "
            "shared host vary ±15% on the headline and up to 2× on "
            "individual heavy queries (same code, same data); compare "
            "rounds by direction and magnitude, not single-run decimals.\n\n"
            "Why this pair: on a real cluster each added EXECUTOR brings its "
            "own memory bandwidth; on this single host string-heavy parsing "
            "saturates the shared memory bus above ~12 threads (pure-compute "
            "scales ~21×/32 procs), so the non-saturated pair is the honest "
            "executor-scaling analogue (full 1..32 curve: SCALE.md/PLANS.md). "
            "Plans are shuffle-free until the final aggregate — no exchange "
            "bottleneck appears at higher executor counts.\n"
            + cmp_section
            + manual
        )


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--report":
        with open(sys.argv[2]) as fh:
            write_bench_md(json.load(fh))
    else:
        main()
