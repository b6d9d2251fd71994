from .ingest import (  # noqa: F401
    stream_conversation_sessions, stream_mention_counts,
    stream_nquads_triples, stream_transcript_triples,
)
