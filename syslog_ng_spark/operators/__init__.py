from . import (  # noqa: F401
    dedup,
    enrich,
    grouping,
    multimodal,
    parsers,
    patterndb,
    rewrite,
    similarity,
    suppress,
    textstats,
)
