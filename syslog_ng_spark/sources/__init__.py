from .io import read_table, read_transcripts, write_sink  # noqa: F401
from .checkpoint import CheckpointedRun  # noqa: F401
