from .ingest import stream_transcript_triples, stream_mention_counts  # noqa: F401
