from . import aggregate, map_prove, mesh, ntt_dist, subchain

__all__ = ["aggregate", "map_prove", "mesh", "ntt_dist", "subchain"]
