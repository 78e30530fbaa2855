from . import goldilocks
from . import ext

__all__ = ["goldilocks", "ext"]
