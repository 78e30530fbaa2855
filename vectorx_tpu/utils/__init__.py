from . import keccak

__all__ = ["keccak"]
