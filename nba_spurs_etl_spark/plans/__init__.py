from .catalog import entry_query, oracles, queries

__all__ = ["entry_query", "oracles", "queries"]
