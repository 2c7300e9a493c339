from .registry import QuerySpec, all_specs, get, oracle_map, query_map, register

__all__ = ["QuerySpec", "all_specs", "get", "oracle_map", "query_map", "register"]
