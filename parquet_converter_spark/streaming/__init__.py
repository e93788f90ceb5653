"""Structured Streaming ingest for the encode pipeline."""
