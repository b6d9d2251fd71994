"""Distributed sources/sinks (N-Quads today; the transcript generator
lives in transcripts.py, context loading in kernel/loaders.py)."""
from .nquads import (
    nquads_lines, parse_nquads_lines, read_nquads, write_nquads,
)

__all__ = ["nquads_lines", "parse_nquads_lines", "read_nquads",
           "write_nquads"]
