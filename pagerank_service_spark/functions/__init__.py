"""Scalar/text/dedup/similarity function library."""
