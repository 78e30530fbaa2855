from . import air, challenger, fri, merkle, prover, verifier

__all__ = ["air", "challenger", "fri", "merkle", "prover", "verifier"]
