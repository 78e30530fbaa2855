from . import aggregate, map_prove, mesh, multihost, ntt_dist, subchain

__all__ = ["aggregate", "map_prove", "mesh", "multihost", "ntt_dist",
           "subchain"]
