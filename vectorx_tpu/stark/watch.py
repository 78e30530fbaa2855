"""In-pipeline value watching — the `builder.watch` debugging equivalent.

The reference uses plonky2x's ``builder.watch`` to print circuit variables
during witness generation (/root/reference/circuits/builder/
subchain_verification.rs:415). Here `watch` taps any traced tensor via
jax.debug.callback (works under jit and on TPU), printing field elements
canonically; `watch_fp` pretty-prints Goldilocks pairs.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

log = logging.getLogger("vectorx.watch")


def watch(label: str, value) -> None:
    """Print a traced array when the computation actually runs."""
    def cb(v):
        log.info("watch %s: %s", label, np.asarray(v))
    jax.debug.callback(cb, value)


def watch_fp(label: str, fp) -> None:
    """Print a Goldilocks (lo, hi) pair as canonical integers."""
    def cb(lo, hi):
        vals = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(lo).astype(np.uint64)
        log.info("watch %s: %s", label, vals)
    jax.debug.callback(cb, fp[0], fp[1])
