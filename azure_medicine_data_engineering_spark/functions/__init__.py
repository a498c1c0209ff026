"""Column-level function library (casting/repair, stats, mining)."""
