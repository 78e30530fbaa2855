from . import store, operator, indexer, dummy, events, tools

__all__ = ["store", "operator", "indexer", "dummy", "events", "tools"]
