"""Structured Streaming layer: stateful slicing operator, exactly-once
sink, stream-stream interval join."""
