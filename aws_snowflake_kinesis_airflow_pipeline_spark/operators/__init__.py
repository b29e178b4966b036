"""Composite DataFrame operators (each returns a DataFrame, never collects)."""
