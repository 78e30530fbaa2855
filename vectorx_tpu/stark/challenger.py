"""Fiat-Shamir transcript (duplex Poseidon sponge), fully jittable.

Mirrors the role of plonky2's ``Challenger`` in the reference prover's
dependency stack (SURVEY.md §2.2 "Poseidon hash": transcript hashing).
Both prover and verifier drive an identical, statically-shaped sequence of
observe/squeeze calls, so the whole protocol traces under ``jax.jit``.

State: one Poseidon width-12 state. Absorption is overwrite-mode in RATE(=8)
chunks; each squeeze reads up to 8 lanes then permutes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ext
from ..hashes import poseidon as ps


@dataclass
class Challenger:
    state: gl.Fp  # (12,)
    # buffered inputs not yet absorbed (list of scalar Fp)
    pending: List[gl.Fp]

    @staticmethod
    def new() -> "Challenger":
        return Challenger(state=gl.zeros((ps.WIDTH,)), pending=[])

    # -- observe ----------------------------------------------------------

    def observe(self, elems: gl.Fp) -> None:
        """Observe a flat (k,) vector of field elements."""
        k = elems[0].shape[0]
        for i in range(k):
            self.pending.append((elems[0][i], elems[1][i]))
            if len(self.pending) == ps.RATE:
                self._absorb()

    def observe_digests(self, digests: gl.Fp) -> None:
        """Observe (n, 4) digests (e.g. a Merkle cap)."""
        self.observe((digests[0].reshape(-1), digests[1].reshape(-1)))

    def _absorb(self) -> None:
        lo = jnp.stack([p[0] for p in self.pending])
        hi = jnp.stack([p[1] for p in self.pending])
        n = len(self.pending)
        s_lo = jnp.concatenate([lo, self.state[0][n:]])
        s_hi = jnp.concatenate([hi, self.state[1][n:]])
        self.state = ps.permute((s_lo, s_hi))
        self.pending = []

    # -- squeeze ----------------------------------------------------------

    def _flush(self) -> None:
        if self.pending:
            self._absorb()

    def squeeze(self, n: int) -> gl.Fp:
        """Draw n field-element challenges as a (n,) vector."""
        self._flush()
        outs_lo, outs_hi = [], []
        remaining = n
        while remaining > 0:
            take = min(remaining, ps.RATE)
            outs_lo.append(self.state[0][:take])
            outs_hi.append(self.state[1][:take])
            self.state = ps.permute(self.state)
            remaining -= take
        return jnp.concatenate(outs_lo), jnp.concatenate(outs_hi)

    def squeeze_ext(self, n: int) -> ext.Fp2:
        base = self.squeeze(2 * n)
        return (base[0][0::2], base[1][0::2]), (base[0][1::2], base[1][1::2])

    def squeeze_indices(self, n: int, domain_bits: int) -> jax.Array:
        """n query indices in [0, 2^domain_bits). p ≡ 1 (mod 2^32) so taking
        the low word is (2^-32)-close to uniform."""
        ch = self.squeeze(n)
        mask = jnp.uint32((1 << domain_bits) - 1)
        return (ch[0] & mask).astype(jnp.int32)
