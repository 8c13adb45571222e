from .stream import stream_route, windowed_counts  # noqa: F401
