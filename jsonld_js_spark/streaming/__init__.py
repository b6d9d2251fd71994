from .ingest import (  # noqa: F401
    stream_asof_attach, stream_conversation_sessions,
    stream_countmin_tokens, stream_dedup_documents,
    stream_entity_timeline, stream_hll_postings,
    stream_mention_counts, stream_neardup_pairs, stream_nquads_triples,
    stream_tool_transitions, stream_transcript_triples,
)
