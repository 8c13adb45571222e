"""spark-submit deployment contract (north rule: `spark-submit
--py-files` on a multi-executor cluster): build the package zip, submit
the pipeline entrypoint against a generated corpus in a FRESH JVM, and
check the per-sink counts it prints plus the sink tables it writes."""

import json
import os
import shutil
import subprocess
import zipfile


def test_spark_submit_py_files_pipeline(spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "transcripts")
    from syslog_ng_spark.datagen import write_transcripts

    write_transcripts(spark, src, n_convs=100, avg_turns=6)
    expected_total = spark.read.parquet(src).count()

    zpath = str(tmp_path / "syslog_ng_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "syslog_ng_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    out_dir = str(tmp_path / "sinks")
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(repo, "tools", "submit_pipeline.py"),
            "--input", src,
            "--output", out_dir,
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)
    counts = result["per_sink_counts"]
    assert set(counts) == {"security", "bash", "other"}
    assert sum(counts.values()) == expected_total  # routed-row parity
    for sink, n in counts.items():
        got = spark.read.parquet(f"{out_dir}/{sink}").count()
        assert got == n
