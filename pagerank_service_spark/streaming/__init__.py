"""Structured Streaming renditions of the reference's incremental
ingestion machinery."""
