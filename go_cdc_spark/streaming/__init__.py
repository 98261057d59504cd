"""Streaming layer: changelog replay source, stateful dedup, materializer."""
