"""Structured Streaming surface: continuous page ingestion."""
