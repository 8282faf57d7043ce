from .registry import QuerySpec, all_queries, oracle_map, query_map, register

__all__ = ["QuerySpec", "all_queries", "oracle_map", "query_map", "register"]
