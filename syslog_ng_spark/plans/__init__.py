from .pipeline import (  # noqa: F401
    LogPath,
    Pipeline,
    RoutedFrame,
    if_else,
    junction,
    log_scheduler,
)
