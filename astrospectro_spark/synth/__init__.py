from .transcripts import (  # noqa: F401
    SCALES,
    generate_anchors,
    generate_ref_events,
    generate_transcripts,
    write_scale,
)
