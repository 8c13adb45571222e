"""connected_components at scale — round-7 validation of the
bounded-driver fast path and the slimmed distributed loop.

Generates a deterministic edge list with KNOWN components (per-cluster
chains: cluster c spans ids [c*S, c*S+S-1] linked in a path — chains are
the pointer-jumping worst case), then:

1. n_edges under the driver bound → the numpy fast path must return the
   exact component map (checked against the closed form) in one job.
2. n_edges over the bound → the distributed loop must run (and be
   correct) — proving the escape, and timing the loop that production
   graphs above 2M edges take.

Run ALONE.  Usage: python tools/scale_cc.py [n_edges_big]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.operators.dedup import connected_components
from syslog_ng_spark.session import get_spark

N_BIG = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
CHAIN = 50  # ids per cluster (chain length)

spark = get_spark(app_name="scale_cc")
spark.sparkContext.setJobDescription("scale_cc: edge gen")


def edges(n_edges: int):
    """Path edges (i, i+1) except across cluster boundaries; exactly
    n_edges rows, components = floor(id / CHAIN) * CHAIN minima."""
    return (
        spark.range(n_edges + n_edges // CHAIN + CHAIN)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .filter((F.col("id_b") % CHAIN) != 0)  # break chains at cluster ends
        .limit(n_edges)
    )


def check(pairs, tag, **kw):
    t0 = time.time()
    comp = connected_components(pairs, **kw)
    # exactness: every node's component must be the min id of its
    # CHAIN-block; verify with one aggregate (zero rows may mismatch)
    bad = comp.filter(
        F.col("component") != (F.floor(F.col("id") / CHAIN) * CHAIN)
    ).count()
    n = comp.count()
    dt = time.time() - t0
    print(f"{tag}: nodes={n:,} mismatches={bad} wall={dt:.1f}s", flush=True)
    assert bad == 0, f"{tag}: {bad} wrong components"
    return dt


# 1) under-bound: driver numpy path (1.5M edges, bound 2M)
small = edges(1_500_000).persist()
small.count()
spark.sparkContext.setJobDescription("scale_cc: driver path 1.5M edges")
t_driver = check(small, "driver-path 1.5M edges")
spark.sparkContext.setJobDescription("scale_cc: distributed path 1.5M edges")
t_dist = check(small, "distributed 1.5M edges", driver_max_edges=None)
small.unpersist()
print(f"crossover at 1.5M edges: driver {t_driver:.1f}s vs distributed {t_dist:.1f}s")

# 2) over-bound: escape must take the distributed loop and stay exact
big = edges(N_BIG).persist()
big.count()
spark.sparkContext.setJobDescription(f"scale_cc: escape path {N_BIG} edges")
t_big = check(big, f"over-bound {N_BIG:,} edges (auto-escape)")
big.unpersist()
print("ALL OK", flush=True)
spark.stop()
