from .windowed import stream_events, windowed_counts  # noqa: F401
