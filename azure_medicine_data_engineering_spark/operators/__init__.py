"""Operators: cleaning, quality, summaries, divisions, dedup, similarity, text."""
