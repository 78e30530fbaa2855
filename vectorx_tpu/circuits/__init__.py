from . import consts, scale, commitments

__all__ = ["consts", "scale", "commitments"]
