"""Registered queries + DuckDB oracles for the driver's correctness gate."""
