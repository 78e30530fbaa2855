from . import air, challenger, fri, merkle, prover, serialize, verifier

__all__ = ["air", "challenger", "fri", "merkle", "prover", "serialize",
           "verifier"]
# heavier statement/AIR modules (air_*, statements, recursion) import on
# demand — they pull domain constants and host crypto deps
