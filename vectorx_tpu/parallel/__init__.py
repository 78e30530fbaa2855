from . import mesh, subchain

__all__ = ["mesh", "subchain"]
