"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry through Spark AND its oracle_sql() through
DuckDB on the same parquet tables, compare row count + schema + an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from syslog_ng_spark.session import get_spark  # noqa: E402
from syslog_ng_spark.sources.io import TABLES  # noqa: E402


def _normalize(rows, columns):
    """Sort columns by name, stringify values, sort rows → stable hash.

    Values carry a TYPE TAG (i:/f:/s:/t:/b:) so int-vs-float drift is a
    hash mismatch even when the numeric value agrees: DuckDB HUGEINT
    (sum of any int type) becomes float64 through pandas, which a plain
    str() would render "123.0" vs Spark's "123" — driver round 1 failed
    exactly this way while a lossy %.6g here said OK.
    """
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if hasattr(v, "item") and not hasattr(v, "isoformat"):
                v = v.item()  # numpy scalar from .df()
            if hasattr(v, "isoformat"):  # datetime.datetime / pd.Timestamp
                tagged = "t:" + v.isoformat(sep=" ").replace("T", " ")
            elif isinstance(v, bool):
                tagged = f"b:{v}"
            elif isinstance(v, float):
                tagged = f"f:{v:.6g}"
            elif isinstance(v, int):
                tagged = f"i:{v}"
            elif isinstance(v, str):
                tagged = "s:" + v
            else:
                tagged = "o:" + str(v)
            vals.append(tagged)
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows-only  n={len(srows)}  ({t1-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            # .df() (not fetchall) — the driver goes through pandas, where
            # DuckDB HUGEINT degrades to float64; replicate that so dtype
            # drift fails HERE before it fails on the driver.
            odf = cur.df()
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            hs, ho = _normalize(srows, scols), _normalize(orows, ocols)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
        if problems:
            print(f"{name:24s} FAIL: {'; '.join(problems)}")
            failures.append(name)
            # show first diffs for debugging
            sset = {r for r in (tuple(map(str, x)) for x in srows)}
            oset = {r for r in (tuple(map(str, x)) for x in orows)}
            print("  spark-only:", list(sset - oset)[:3])
            print("  duck-only :", list(oset - sset)[:3])
        else:
            print(f"{name:24s} OK  n={len(srows)}  ({t1-t0:.1f}s)")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
