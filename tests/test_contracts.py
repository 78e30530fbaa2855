"""Contract-layer tests: byte-path parity + gateway round trip.

No forge/solc in the environment, so contracts/src/VectorX.sol is gated by
its executable Python mirror (services/contract_sim.py). These tests pin:

- the calldata selector bytes the contract emits in requestCall (parity
  with the reference's `testEncoding`, /root/reference/contracts/test/
  VectorX.t.sol:7-27 — same canonical signatures, so identical selectors)
- the 80/40-byte packed request inputs against circuits/abi.py (the layout
  both the Solidity `_headerRangeInput` and the reference contract use)
- the keccak256(abi.encode(start,end)) range key
- the full request → fulfill (dummy program output) → commit round trip
  through the IProofGateway semantics, including every revert path.
"""

import hashlib

import numpy as np
import pytest

from vectorx_tpu.circuits import commitments, scale
from vectorx_tpu.circuits.abi import (HeaderRangeInput, HeaderRangeOutput,
                                      RotateInput, range_commitment_key)
from vectorx_tpu.services import contract_sim as cs
from vectorx_tpu.services import dummy
from vectorx_tpu.utils.keccak import keccak256

RNG = np.random.default_rng(77)


class FakeSource:
    def __init__(self, n_blocks=60):
        self.headers, self.roots = {}, {}
        for b in range(n_blocks):
            sr = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
            dr = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
            hdr = bytes(32) + scale.encode_compact_u32(b) + sr + bytes(8) + dr
            self.headers[b] = hdr
            self.roots[b] = (sr, dr)

    def get_header(self, b):
        return self.headers[b]

    def get_roots_range(self, start, end):
        blocks = range(start + 1, end + 1)
        return ([self.roots[b][0] for b in blocks],
                [self.roots[b][1] for b in blocks])

    def last_justified_block(self, set_id):
        return 40

    def get_authorities(self, b):
        return [bytes([i] * 32) for i in range(4)]


GENESIS_HEADER = bytes([7] * 32)
GENESIS_SET_HASH = bytes([9] * 32)


def make_contract():
    gw = cs.MockProofGateway()
    sim = cs.VectorXSim.deploy(guardian="guardian", gateway=gw, height=10,
                               header=GENESIS_HEADER, authority_set_id=0,
                               authority_set_hash=GENESIS_SET_HASH,
                               tree_size=16)
    return sim, gw


class TestEncoding:
    """Reference testEncoding parity: selector + calldata bytes."""

    def test_selectors_pinned(self):
        # keccak256("commitHeaderRange(uint64,uint32)")[:4] — identical to
        # the reference contract's selector (same canonical signature,
        # VectorX.sol:224-227 there, :241 here)
        assert cs.selector(cs.COMMIT_HEADER_RANGE_SIG).hex() == "1796eb72"
        assert cs.selector(cs.ROTATE_SIG).hex() == "17ce9719"

    def test_commit_calldata_encoding(self):
        data = cs.encode_commit_header_range_call(616, 645610)
        assert data[:4].hex() == "1796eb72"
        assert len(data) == 4 + 64
        assert int.from_bytes(data[4:36], "big") == 616
        assert int.from_bytes(data[36:68], "big") == 645610

    def test_header_range_request_input_is_80_byte_packed(self):
        sim, gw = make_contract()
        sim.request_header_range(0, 25)
        req = gw.requests[-1]
        want = HeaderRangeInput(10, GENESIS_HEADER, 0, GENESIS_SET_HASH,
                                25).encode()
        assert req.input == want and len(req.input) == 80
        assert req.entry_calldata == cs.encode_commit_header_range_call(0, 25)
        assert req.gas_limit == 500_000
        assert req.function_id == sim.header_range_function_id

    def test_rotate_request_input_is_40_byte_packed(self):
        sim, gw = make_contract()
        sim.request_rotate(0)
        req = gw.requests[-1]
        assert req.input == RotateInput(0, GENESIS_SET_HASH).encode()
        assert len(req.input) == 40
        assert req.entry_calldata == cs.encode_rotate_call(0)

    def test_range_key_is_keccak_of_abi_encode(self):
        key = range_commitment_key(100, 200)
        assert key == keccak256(
            (100).to_bytes(32, "big") + (200).to_bytes(32, "big"))


class TestRoundTrip:
    def test_header_range_request_fulfill_commit(self):
        sim, gw = make_contract()
        src = FakeSource()
        sim.block_height_to_header_hash[10] = hashlib.blake2b(
            src.get_header(10), digest_size=32).digest()
        sim.request_header_range(0, 25)
        req = gw.requests[-1]
        output = dummy.dummy_header_range(req.input, src, tree_size=16)
        gw.fulfill_request(req, output)   # invokes commitHeaderRange via
        # the recorded abi.encodeWithSelector calldata
        assert sim.latest_block == 25
        out = HeaderRangeOutput.decode(output)
        assert sim.block_height_to_header_hash[25] == out.target_header_hash
        key = range_commitment_key(10, 25)
        assert sim.data_root_commitments[key] == out.data_root_commitment
        assert sim.state_root_commitments[key] == out.state_root_commitment
        assert sim.range_start_blocks[key] == 10
        names = [e.name for e in sim.events]
        assert names[-2:] == ["HeaderRangeCommitmentStored", "HeadUpdate"]
        stored = sim.events[-2].args
        assert stored["startBlock"] == 10 and stored["endBlock"] == 25
        assert stored["headerRangeCommitmentTreeSize"] == 16

    def test_rotate_request_fulfill(self):
        sim, gw = make_contract()
        src = FakeSource()
        sim.request_rotate(0)
        req = gw.requests[-1]
        output = dummy.dummy_rotate(req.input, src)
        assert output == commitments.authority_set_hash(
            src.get_authorities(40))
        gw.fulfill_request(req, output)
        assert sim.authority_set_id_to_hash[1] == output
        assert sim.events[-1].name == "AuthoritySetStored"
        assert sim.events[-1].args["authoritySetId"] == 1

    def test_commit_without_proof_reverts(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="no verified output"):
            sim.commit_header_range(0, 25)

    def test_proof_is_input_bound(self):
        # fulfilling for one input must not unlock a different target block
        sim, gw = make_contract()
        src = FakeSource()
        sim.request_header_range(0, 25)
        req = gw.requests[-1]
        gw.fulfill(req.function_id, req.input,
                   dummy.dummy_header_range(req.input, src, 16))
        with pytest.raises(cs.Revert, match="no verified output"):
            sim.commit_header_range(0, 30)
        sim.commit_header_range(0, 25)    # the proven pair still works
        assert sim.latest_block == 25


class TestReverts:
    def test_frozen_blocks_commits(self):
        sim, gw = make_contract()
        sim.update_freeze(True, sender="guardian")
        with pytest.raises(cs.Revert, match="ContractFrozen"):
            sim.commit_header_range(0, 25)
        with pytest.raises(cs.Revert, match="ContractFrozen"):
            sim.rotate(0)

    def test_only_guardian(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="NotGuardian"):
            sim.update_freeze(True, sender="mallory")

    def test_old_authority_set_rejected(self):
        sim, _ = make_contract()
        sim.authority_set_id_to_hash[5] = bytes([1] * 32)
        sim.latest_authority_set_id = 5
        sim.authority_set_id_to_hash[3] = bytes([2] * 32)
        with pytest.raises(cs.Revert, match="OldAuthoritySetId"):
            sim.request_header_range(3, 25)

    def test_target_must_advance(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="target not ahead"):
            sim.request_header_range(0, 10)

    def test_unknown_authority_set(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="AuthoritySetNotFound"):
            sim.request_header_range(42, 25)

    def test_next_set_exists_blocks_rotate(self):
        sim, _ = make_contract()
        sim.authority_set_id_to_hash[1] = bytes([3] * 32)
        with pytest.raises(cs.Revert, match="NextAuthoritySetExists"):
            sim.request_rotate(0)

    def test_bad_output_length_rejected(self):
        sim, gw = make_contract()
        sim.request_header_range(0, 25)
        req = gw.requests[-1]
        gw.fulfill(req.function_id, req.input, b"\x00" * 95)
        with pytest.raises(cs.Revert, match="bad output length"):
            sim.commit_header_range(0, 25)


class TestGuardianRangeData:
    def test_update_block_range_data(self):
        sim, _ = make_contract()
        h1, h2 = bytes([1] * 32), bytes([2] * 32)
        sim.update_block_range_data(
            [10, 20], [20, 30], [h1, h2],
            [bytes([4] * 32), bytes([5] * 32)],
            [bytes([6] * 32), bytes([7] * 32)],
            end_authority_set_id=2, end_authority_set_hash=bytes([8] * 32),
            sender="guardian")
        assert sim.latest_block == 30
        assert sim.block_height_to_header_hash[30] == h2
        assert sim.data_root_commitments[range_commitment_key(20, 30)] == \
            bytes([5] * 32)
        assert sim.latest_authority_set_id == 2

    def test_non_contiguous_rejected(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="not contiguous"):
            sim.update_block_range_data(
                [10, 25], [20, 30], [bytes(32)] * 2, [bytes(32)] * 2,
                [bytes(32)] * 2, 1, bytes(32), sender="guardian")

    def test_must_extend_head(self):
        sim, _ = make_contract()
        with pytest.raises(cs.Revert, match="extend head"):
            sim.update_block_range_data(
                [11], [20], [bytes(32)], [bytes(32)], [bytes(32)],
                1, bytes(32), sender="guardian")
