from .registry import QUERIES, ORACLES, query, get_queries, get_oracles

__all__ = ["QUERIES", "ORACLES", "query", "get_queries", "get_oracles"]
