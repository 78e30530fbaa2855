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


def serialize_config(config) -> bytes:
    return json.dumps({"version": VERSION, **asdict(config)},
                      sort_keys=True).encode()


def deserialize_config(data: bytes, cls):
    blob = json.loads(data.decode())
    assert blob.pop("version") == VERSION
    return cls(**blob)
