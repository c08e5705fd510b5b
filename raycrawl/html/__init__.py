"""Stdlib-only HTML parsing, cleaning, metadata and markdown conversion."""
