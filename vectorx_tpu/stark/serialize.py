"""Proof / config serialization — the build/prove artifact boundary.

Role parity with the reference's circuit+proof serialization
(`GateRegistry`/`HintRegistry` + `test_serializers`, /root/reference/
circuits/header_range.rs:96-126): compiled-prover configuration and proofs
must survive a (de)serialization round trip so the platform can split
`build` and `prove` across machines/processes.

Format: a self-describing JSON header (pytree structure + shapes/dtypes +
framework version + config) followed by the concatenated little-endian
array payload. Deterministic; versioned; round-trip tested.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"VXTP"
VERSION = 1


def _flatten(proof) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(proof)
    return leaves, treedef


def serialize_proof(proof) -> bytes:
    leaves, treedef = _flatten(proof)
    metas = []
    payload = b""
    for leaf in leaves:
        arr = np.asarray(leaf)
        metas.append({"shape": list(arr.shape), "dtype": str(arr.dtype)})
        payload += arr.tobytes()
    header = json.dumps({
        "version": VERSION,
        "treedef": str(treedef),
        "leaves": metas,
    }).encode()
    return MAGIC + len(header).to_bytes(4, "little") + header + payload


def deserialize_proof(data: bytes, like) -> Any:
    """Reconstruct a proof with the same pytree structure as `like`.

    The treedef string in the header is checked against `like`'s, so a
    proof can only be loaded into the prover configuration that made it
    (the reference's registry-matching property).
    """
    assert data[:4] == MAGIC, "bad magic"
    hlen = int.from_bytes(data[4:8], "little")
    header = json.loads(data[8:8 + hlen].decode())
    assert header["version"] == VERSION, header["version"]

    like_leaves, like_treedef = _flatten(like)
    assert header["treedef"] == str(like_treedef), "proof structure mismatch"

    off = 8 + hlen
    leaves = []
    for meta, like_leaf in zip(header["leaves"], like_leaves):
        dtype = np.dtype(meta["dtype"])
        shape = tuple(meta["shape"])
        count = int(np.prod(shape)) if shape else 1
        nbytes = count * dtype.itemsize
        arr = np.frombuffer(data[off:off + nbytes], dtype=dtype).reshape(shape)
        off += nbytes
        leaves.append(jnp.asarray(arr))
    assert off == len(data), "trailing bytes"
    return jax.tree_util.tree_unflatten(like_treedef, leaves)


def empty_proof_like_shapes(air, config, log_n: int):
    """A zero StarkProof with the exact pytree structure/shapes that
    `prover.prove(air, ..., config)` emits for a 2^log_n-row trace —
    the deserialization template (`like`) reconstructible from the prover
    configuration alone, so proof artifacts can be loaded by a process
    that never proved (the reference's build/prove split,
    succinct.json:6-9)."""
    from . import fri as fr
    from . import prover as pv

    q = config.num_queries
    C = air.num_cols
    chunks = pv.num_quotient_chunks(air)
    cap = 1 << config.cap_height
    log_n0 = log_n + config.rate_bits
    depth = log_n0 - config.cap_height

    def fp(*shape):
        return (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))

    def fp2(*shape):
        return (fp(*shape), fp(*shape))

    fc = config.fri_config
    n_layers = fc.num_layers(log_n0)
    caps = [fp(cap, 4) for _ in range(n_layers)]
    q_leaves = [fp(q, 4) for _ in range(n_layers)]
    q_paths = [fp(q, log_n0 - layer - 1 - config.cap_height, 4)
               for layer in range(n_layers)]
    fri_proof = fr.FriProof(caps=caps, final_coeffs=fp2(fc.final_poly_len),
                            query_leaves=q_leaves, query_paths=q_paths,
                            pow_nonce=fp())

    n_lk = len(air.lookup_range_columns())
    has_ram = air.ram_multiset() is not None
    has_lk = n_lk > 0 or has_ram
    n_aux = pv.num_aux_cols(n_lk, has_ram) if has_lk else 0
    import numpy as _np
    n_consts = _np.asarray(air.constant_columns(1 << log_n)).shape[0]
    has_consts = n_consts > 0
    from .prover import StarkProof
    return StarkProof(
        trace_cap=fp(cap, 4), quotient_cap=fp(cap, 4),
        trace_zeta=fp2(C), trace_gzeta=fp2(C), quotient_zeta=fp2(chunks),
        fri_proof=fri_proof,
        trace_rows_a=fp(q, C), trace_rows_b=fp(q, C),
        trace_paths_a=fp(q, depth, 4), trace_paths_b=fp(q, depth, 4),
        quot_rows_a=fp(q, 2 * chunks), quot_rows_b=fp(q, 2 * chunks),
        quot_paths_a=fp(q, depth, 4), quot_paths_b=fp(q, depth, 4),
        aux_cap=fp(cap, 4) if has_lk else None,
        aux_zeta=fp2(n_aux) if has_lk else None,
        aux_gzeta=fp2(n_aux) if has_lk else None,
        aux_rows_a=fp(q, n_aux) if has_lk else None,
        aux_rows_b=fp(q, n_aux) if has_lk else None,
        aux_paths_a=fp(q, depth, 4) if has_lk else None,
        aux_paths_b=fp(q, depth, 4) if has_lk else None,
        const_zeta=fp2(n_consts) if has_consts else None,
        const_gzeta=fp2(n_consts) if has_consts else None,
        const_rows_a=fp(q, n_consts) if has_consts else None,
        const_rows_b=fp(q, n_consts) if has_consts else None,
        const_paths_a=fp(q, depth, 4) if has_consts else None,
        const_paths_b=fp(q, depth, 4) if has_consts else None,
    )


def serialize_config(config) -> bytes:
    return json.dumps({"version": VERSION, **asdict(config)},
                      sort_keys=True).encode()


def deserialize_config(data: bytes, cls):
    blob = json.loads(data.decode())
    assert blob.pop("version") == VERSION
    return cls(**blob)
