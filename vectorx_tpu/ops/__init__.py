from . import poseidon_pallas

__all__ = ["poseidon_pallas"]
