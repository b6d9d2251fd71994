"""Distributed sources/sinks (N-Quads, JSONL; the transcript
generator lives in transcripts.py, context loading in
kernel/loaders.py)."""
from .jsonl import read_jsonl, write_jsonl
from .nquads import (
    nquads_lines, parse_nquads_lines, read_nquads, write_nquads,
)

__all__ = ["nquads_lines", "parse_nquads_lines", "read_nquads",
           "read_jsonl", "write_jsonl", "write_nquads"]
