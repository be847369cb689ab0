"""Structured Streaming layer: incremental (CDC-style) re-checking."""
