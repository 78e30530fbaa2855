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


@jax.jit
def _absorb_chunks(state: gl.Fp, chunks: gl.Fp) -> gl.Fp:
    """Absorb (n, RATE) element chunks: overwrite-mode duplex under a scan
    — one compiled program regardless of n."""
    def body(st, ch):
        s_lo = jnp.concatenate([ch[0], st[0][ps.RATE:]])
        s_hi = jnp.concatenate([ch[1], st[1][ps.RATE:]])
        return ps.permute((s_lo, s_hi)), None
    st, _ = jax.lax.scan(body, state, chunks)
    return st


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
        """Observe a flat (k,) vector of field elements.

        Full RATE-sized chunks absorb under ONE scanned permutation program
        (the openings of a wide AIR are thousands of elements — per-chunk
        eager dispatch would dominate a warm prove on the device tunnel);
        the remainder stays pending, exactly as the element-wise loop did."""
        k = int(elems[0].shape[0])
        n_pend = len(self.pending)
        if n_pend:
            lo = jnp.concatenate([jnp.stack([p[0] for p in self.pending]),
                                  elems[0]])
            hi = jnp.concatenate([jnp.stack([p[1] for p in self.pending]),
                                  elems[1]])
        else:
            lo, hi = elems[0], elems[1]
        total = n_pend + k
        nfull = total // ps.RATE
        if nfull:
            chunks = (lo[:nfull * ps.RATE].reshape(nfull, ps.RATE),
                      hi[:nfull * ps.RATE].reshape(nfull, ps.RATE))
            self.state = _absorb_chunks(self.state, chunks)
        rem = total - nfull * ps.RATE
        self.pending = [(lo[nfull * ps.RATE + i], hi[nfull * ps.RATE + i])
                        for i in range(rem)]

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
