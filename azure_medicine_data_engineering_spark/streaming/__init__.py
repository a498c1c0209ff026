"""Structured Streaming layer (scale extension — SURVEY §2.9)."""
