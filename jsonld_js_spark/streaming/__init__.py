from .ingest import (  # noqa: F401
    stream_conversation_sessions, stream_mention_counts,
    stream_transcript_triples,
)
