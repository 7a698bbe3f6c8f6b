from .registry import QUERIES, QuerySpec, all_oracle_sql, all_queries

__all__ = ["QUERIES", "QuerySpec", "all_oracle_sql", "all_queries"]
