"""Source surface (S1/S2 analogues): staged-tuple ingestion, transcripts
tables (Iceberg with parquet fallback), and the streaming reader."""

from ..model import edges_from_tuples, nodes_from_tuples
from ..streaming.stream import read_transcript_stream, stream_kg
from ..transcripts import generate_transcripts, read_transcripts

__all__ = [
    "edges_from_tuples",
    "generate_transcripts",
    "nodes_from_tuples",
    "read_transcript_stream",
    "stream_kg",
    "read_transcripts",
]
