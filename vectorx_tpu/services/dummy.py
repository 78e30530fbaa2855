"""Dummy programs — byte-ABI-exact non-ZK stand-ins.

Parity with the reference's rustx programs (`DummyHeaderRange`,
`DummyRotate`): same request/response byte layouts, same computed outputs
(target header hash + range commitments / new authority-set hash), no proof.
Used to operate the contract without proving (reference README.md:134-136)
and as golden-vector fixtures (dummy_header_range.rs:55-77,
dummy_rotate.rs:32-55).

The chain-data dependency is injected (`HeaderSource`) so the programs are
hermetically testable; production wires it to the Avail RPC fetcher.
"""

from __future__ import annotations

import hashlib
from typing import List, Protocol, Tuple

from ..circuits import commitments
from ..circuits.abi import HeaderRangeInput, HeaderRangeOutput, RotateInput


class HeaderSource(Protocol):
    def get_header(self, block_number: int) -> bytes:
        """SCALE-encoded header bytes."""
        ...

    def get_roots_range(self, start_block: int, end_block: int
                        ) -> Tuple[List[bytes], List[bytes]]:
        """(state_roots, data_roots) for blocks start+1..=end."""
        ...

    def last_justified_block(self, authority_set_id: int) -> int: ...

    def get_authorities(self, block_number: int) -> List[bytes]: ...


def dummy_header_range(input_bytes: bytes, source: HeaderSource,
                       tree_size: int) -> bytes:
    """DummyHeaderRange::run (dummy_header_range.rs:11-52)."""
    inp = HeaderRangeInput.decode(input_bytes)
    target_header = source.get_header(inp.target_block)
    target_hash = hashlib.blake2b(target_header, digest_size=32).digest()
    state_roots, data_roots = source.get_roots_range(inp.trusted_block,
                                                     inp.target_block)
    state_c, data_c = commitments.range_commitments(state_roots, data_roots,
                                                    tree_size)
    return HeaderRangeOutput(target_hash, state_c, data_c).encode()


def dummy_rotate(input_bytes: bytes, source: HeaderSource) -> bytes:
    """DummyRotate::run (dummy_rotate.rs:7-30)."""
    inp = RotateInput.decode(input_bytes)
    epoch_end_block = source.last_justified_block(inp.authority_set_id)
    authorities = source.get_authorities(epoch_end_block)
    return commitments.authority_set_hash(authorities)
