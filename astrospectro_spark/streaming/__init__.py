from .session_stream import stream_featurize, stream_session_stats  # noqa: F401
