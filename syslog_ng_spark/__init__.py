"""syslog_ng_spark — a PySpark-native parse → enrich → route → aggregate
log/telemetry engine with the query capabilities of syslog-ng, rebuilt
from scratch (not ported) for 100 TB-scale tables of conversation/agent
transcripts.

Layout
------
- ``schema``      — transcript schema + syslog facility/severity model
- ``datagen``     — deterministic Spark-native synthetic transcript generator
- ``functions``   — macros (~syslog-ng template macros), template compiler,
                    filter-expression AST → Column compiler
- ``operators``   — parsers (syslog/csv/kv/json/regexp/patterndb/date),
                    rewrites, enrichment joins, grouping-by aggregation,
                    suppress/rate-limit, dedup (exact/minhash/simhash),
                    similarity search, text analysis, multimodal plumbing
- ``plans``       — log-path routing compiler (final/fallback/catchall)
- ``sources``     — read/write helpers, metrics + checkpoint (persist-state
                    analogue)
- ``streaming``   — Structured Streaming variants of the stateful operators

Everything is expressed against the DataFrame API so Catalyst handles
pushdown/pruning/join strategy; Python only runs vectorized (pandas/Arrow)
where built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"
