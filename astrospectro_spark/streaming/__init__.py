from .session_stream import (  # noqa: F401
    stateful_asof_enrich,
    stateful_featurize,
    stream_featurize,
    stream_session_stats,
)
