from . import store, operator, indexer, dummy

__all__ = ["store", "operator", "indexer", "dummy"]
