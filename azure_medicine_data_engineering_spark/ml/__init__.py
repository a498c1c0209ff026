"""Spark ML layer (SURVEY §2.12): impute → scale → tree → evaluate."""
