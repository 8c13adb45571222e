from .pipeline import LogPath, Pipeline, RoutedFrame, junction, if_else  # noqa: F401
