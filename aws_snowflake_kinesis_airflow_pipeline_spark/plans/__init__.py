"""Query registry — the testable operator inventory (SURVEY.md §2)."""

from .registry import QUERIES, Query, oracle_sql_map, queries_map

__all__ = ["QUERIES", "Query", "queries_map", "oracle_sql_map"]
