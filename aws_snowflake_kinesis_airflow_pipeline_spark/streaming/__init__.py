"""Structured Streaming re-expression of the reference's Airflow DAGs."""
