"""Operational CLI tools (bulk ingest, ...)."""
