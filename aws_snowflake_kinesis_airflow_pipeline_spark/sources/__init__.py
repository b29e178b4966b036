"""Batch and streaming sources/sinks for the landing-zone format."""
