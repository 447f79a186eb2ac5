from .transcripts import synthesize_transcripts, transcripts_schema

__all__ = ["synthesize_transcripts", "transcripts_schema"]
