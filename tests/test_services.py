import asyncio
import hashlib
import os

import numpy as np
import pytest

from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives import serialization

from vectorx_tpu.circuits import commitments, scale
from vectorx_tpu.circuits.abi import (HeaderRangeInput, HeaderRangeOutput,
                                      RotateInput, range_commitment_key)
from vectorx_tpu.services import dummy, grandpa, indexer, operator, store
from vectorx_tpu.utils.keccak import keccak256

RNG = np.random.default_rng(11)


class TestKeccak:
    def test_known_vectors(self):
        # keccak256("") and keccak256("abc") — Ethereum-standard digests
        assert keccak256(b"").hex() == (
            "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
        assert keccak256(b"abc").hex() == (
            "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
        assert keccak256(b"x" * 200).hex() != keccak256(b"x" * 201).hex()


class TestAbi:
    def test_header_range_round_trip(self):
        inp = HeaderRangeInput(1234, bytes(range(32)), 77, bytes(range(32, 64)), 5678)
        assert HeaderRangeInput.decode(inp.encode()) == inp
        assert len(inp.encode()) == 80

    def test_golden_header_range_input(self):
        # from the reference's pinned proof input (dummy_header_range.rs:66)
        raw = bytes.fromhex(
            "0003c18695f303b01e4834da35e5fdc3971fe297d1b48feb0c3f330491639136"
            "a6ada5980000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5"
            "212b72cc7e8eddce8b80958d0003c23a")
        inp = HeaderRangeInput.decode(raw)
        assert inp.trusted_block == 0x0003c186
        assert inp.authority_set_id == 0x75
        assert inp.target_block == 0x0003c23a
        assert inp.encode() == raw

    def test_golden_rotate_input(self):
        raw = bytes.fromhex(
            "0000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5212b72cc"
            "7e8eddce8b80958d0003c6f0"[:80])
        # rotate input is the first 40 bytes
        inp = RotateInput.decode(raw[:40])
        assert inp.authority_set_id == 0x75
        assert inp.encode() == raw[:40]

    def test_range_key(self):
        k = range_commitment_key(100, 200)
        assert len(k) == 32


# The reference pins exact input -> output hex for both dummy programs
# against LIVE Avail chain data (dummy_header_range.rs:64-75 blocks
# 246150->246330, dummy_rotate.rs:41-53 authority set 0x75). The data
# cannot be synthesized (real chain hashes), so the assertion runs
# whenever egress exists — hermetic CI covers the same code paths with
# synthetic fixtures above (test_dummy_header_range / test_dummy_rotate).
GOLDEN_HR_INPUT = (
    "0003c18695f303b01e4834da35e5fdc3971fe297d1b48feb0c3f330491639136"
    "a6ada5980000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5"
    "212b72cc7e8eddce8b80958d0003c23a")
GOLDEN_HR_OUTPUT = (
    "3aaa82535ce715acb251047c280d5492d1330c41fe24c9841db508ba961dce46"
    "4cb5c2a82cc64e401ac01ba85c471fe1dab4fe4baf7a96c306d4e94dcb428f47"
    "ead156d58c77adfa928845f048b50fd92e871776dfa76ed2f98c6ef823aa7a2d")
GOLDEN_ROT_INPUT = (
    "0000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5212b72cc"
    "7e8eddce8b80958d0003c6f0")
GOLDEN_ROT_OUTPUT = (
    "21969829db96b6cc8171290a231a150fbf4b11911eea1edb7b1d785716797a7f")


@pytest.mark.skipif(not os.environ.get("AVAIL_URL"),
                    reason="zero-egress environment: golden dummy OUTPUT "
                           "parity needs live Avail RPC (set AVAIL_URL)")
def test_golden_dummy_outputs_live():
    from vectorx_tpu.services import entrypoint
    src = entrypoint._live_source()
    out = dummy.dummy_header_range(bytes.fromhex(GOLDEN_HR_INPUT), src,
                                   tree_size=256)
    assert out.hex() == GOLDEN_HR_OUTPUT
    out2 = dummy.dummy_rotate(bytes.fromhex(GOLDEN_ROT_INPUT)[:40], src)
    assert out2.hex() == GOLDEN_ROT_OUTPUT


class FakeSource:
    """Synthetic chain for the dummy programs."""

    def __init__(self, n_blocks=300):
        self.headers = {}
        self.roots = {}
        for b in range(n_blocks):
            sr = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
            dr = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
            hdr = bytes(32) + scale.encode_compact_u32(b) + sr + bytes(10) + dr
            self.headers[b] = hdr
            self.roots[b] = (sr, dr)
        self.authorities_by_block = {}

    def get_header(self, b):
        return self.headers[b]

    def get_roots_range(self, start, end):
        blocks = range(start + 1, end + 1)
        return ([self.roots[b][0] for b in blocks],
                [self.roots[b][1] for b in blocks])

    def last_justified_block(self, set_id):
        return 180

    def get_authorities(self, b):
        return self.authorities_by_block.get(b, [bytes([i] * 32) for i in range(4)])


class TestDummyPrograms:
    def test_dummy_header_range(self):
        src = FakeSource()
        inp = HeaderRangeInput(10, bytes(32), 0, bytes(32), 25)
        out = dummy.dummy_header_range(inp.encode(), src, tree_size=16)
        dec = HeaderRangeOutput.decode(out)
        assert dec.target_header_hash == hashlib.blake2b(
            src.get_header(25), digest_size=32).digest()
        sr, dr = src.get_roots_range(10, 25)
        ws, wd = commitments.range_commitments(sr, dr, 16)
        assert dec.state_root_commitment == ws
        assert dec.data_root_commitment == wd

    def test_dummy_rotate(self):
        src = FakeSource()
        inp = RotateInput(7, bytes(32))
        out = dummy.dummy_rotate(inp.encode(), src)
        assert out == commitments.authority_set_hash(src.get_authorities(180))


class TestIndexer:
    def _make_justification(self, n_auth=6, n_sign=5):
        keys = [Ed25519PrivateKey.generate() for _ in range(n_auth)]
        pubs = [k.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw) for k in keys]
        block_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        j_round, set_id, block_nb = 42, 7, 31337
        msg = indexer.build_signed_message(block_hash, block_nb, j_round, set_id)
        signers = list(range(n_auth))[:n_sign]
        j = indexer.Justification(
            round=j_round, block_hash=block_hash, block_number=block_nb,
            authority_set_id=set_id,
            precommit_pubkeys=[pubs[i] for i in signers],
            precommit_signatures=[keys[i].sign(msg) for i in signers])
        return j, pubs

    def test_verify_and_canonical_order(self):
        j, authorities = self._make_justification()
        stored = indexer.verify_justification(j, authorities, use_device=False)
        assert stored is not None
        assert stored.pubkeys == [p.hex() for p in authorities]
        assert stored.validator_signed == [True] * 5 + [False]
        assert stored.signatures[5] == indexer.DUMMY_SIGNATURE.hex()
        assert bytes.fromhex(stored.signed_message)[0] == 1  # precommit tag

    def test_below_threshold_rejected(self):
        j, authorities = self._make_justification(n_auth=6, n_sign=4)
        # 4 <= (6*2)//3 = 4 -> rejected
        assert indexer.verify_justification(j, authorities, use_device=False) is None

    def test_store_round_trip(self):
        j, authorities = self._make_justification()
        st = store.InMemoryStore()
        stored = indexer.verify_justification(j, authorities, use_device=False)
        st.add_justification(stored)
        got = st.get_justification(j.block_number)
        assert got == stored
        assert st.justified_blocks_in_range(0, 10 ** 6) == [j.block_number]


class FakeChain:
    def __init__(self):
        self.head = 1000
        self.set_ids = {}
        self.last_justified = {}
        self.justified = set()

    async def get_head_block(self):
        return self.head

    async def get_authority_set_id(self, block):
        return self.set_ids.get(block, 5)

    async def last_justified_block(self, set_id):
        return self.last_justified.get(set_id, 0)

    async def has_justification(self, block):
        return block in self.justified


class FakeContract:
    def __init__(self):
        self.latest = 500
        self.tree_size = 256
        self.set_hashes = {}
        self.requests = []

    async def latest_block(self):
        return self.latest

    async def header_range_commitment_tree_size(self):
        return self.tree_size

    async def authority_set_id_to_hash(self, sid):
        return self.set_hashes.get(sid, b"\x00" * 32)

    async def block_height_to_header_hash(self, b):
        return bytes([1] * 32)

    async def request_header_range(self, inp):
        self.requests.append(("header_range", inp))
        return "req-hr"

    async def request_rotate(self, inp):
        self.requests.append(("rotate", inp))
        return "req-rot"


class TestOperator:
    def _mk(self, dummy_mode=True):
        chain, contract = FakeChain(), FakeContract()
        cfg = operator.OperatorConfig(is_dummy=dummy_mode, update_delay_blocks=180)
        return operator.Operator(chain, contract, cfg), chain, contract

    def test_step_to_interval_multiple(self):
        op, chain, contract = self._mk()
        # head 1000, latest 500, tree 256 -> max_valid = min(756,1000) = 756
        # 756 - 756%180 = 720 > 500 -> step to 720
        res = asyncio.run(op.find_block_to_step_to(180, 256, 500, 1000, 5))
        assert res == 720

    def test_step_to_epoch_end(self):
        op, chain, contract = self._mk()
        chain.last_justified[5] = 600
        res = asyncio.run(op.find_block_to_step_to(180, 256, 500, 1000, 5))
        assert res == 600

    def test_no_step_when_caught_up(self):
        op, chain, contract = self._mk()
        chain.head = 505
        res = asyncio.run(op.find_block_to_step_to(180, 256, 500, 505, 5))
        assert res is None

    def test_justification_scan(self):
        op, chain, contract = self._mk(dummy_mode=False)
        chain.justified.add(723)
        res = asyncio.run(op.find_block_to_step_to(180, 256, 500, 1000, 5))
        assert res == 723

    def test_request_header_range_flow(self):
        op, chain, contract = self._mk()
        contract.set_hashes[5] = bytes([2] * 32)
        req = asyncio.run(op.find_and_request_header_range())
        assert req == "req-hr"
        kind, inp = contract.requests[0]
        assert kind == "header_range"
        assert inp.trusted_block == 500 and inp.target_block == 720
        assert inp.authority_set_id == 5

    def test_rotate_requested_when_new_epoch(self):
        op, chain, contract = self._mk()
        chain.set_ids[999] = 6   # head-1 -> set 6
        chain.set_ids[499] = 5   # latest-1 -> set 5
        contract.set_hashes[5] = bytes([2] * 32)
        req = asyncio.run(op.find_and_request_rotate())
        assert req == "req-rot"
        kind, inp = contract.requests[0]
        assert kind == "rotate" and inp.authority_set_id == 5

    def test_run_loop_survives_rpc_failure(self):
        """Failure recovery parity (vectorx.rs:461-478 / SURVEY §5.3): a
        dead RPC iteration is logged and the loop continues; the next
        iteration (connection back) still lands its request."""
        op, chain, contract = self._mk()
        contract.set_hashes[5] = bytes([2] * 32)
        op.config.loop_delay_mins = 0
        calls = {"n": 0}
        orig = contract.latest_block

        async def flaky():
            calls["n"] += 1
            if calls["n"] == 1:
                raise ConnectionError("ws dropped")
            return await orig()

        contract.latest_block = flaky

        async def run_two():
            task = asyncio.ensure_future(op.run())
            for _ in range(200):
                if contract.requests:
                    break
                await asyncio.sleep(0.01)
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass

        asyncio.run(run_two())
        assert calls["n"] >= 2                 # first died, loop went on
        assert contract.requests               # second iteration succeeded


class TestGrandpaDecode:
    """SCALE GrandpaJustification / FinalityProof decoding + alignment
    (services/grandpa.py; layout parity with the reference's epoch-end path,
    input/mod.rs:657-784)."""

    def _encode_justification(self, j_round, set_id, block_hash, block_nb,
                              keys, pubs, n_sign):
        msg = indexer.build_signed_message(block_hash, block_nb, j_round,
                                           set_id)
        enc = j_round.to_bytes(8, "little")
        enc += block_hash + block_nb.to_bytes(4, "little")
        enc += scale.encode_compact_u32(n_sign)
        for i in range(n_sign):
            enc += block_hash + block_nb.to_bytes(4, "little")
            enc += keys[i].sign(msg) + pubs[i]
        enc += scale.encode_compact_u32(0)  # votes_ancestries: []
        return enc, msg

    def _mk(self, n_auth=6, n_sign=5):
        keys = [Ed25519PrivateKey.generate() for _ in range(n_auth)]
        pubs = [k.public_key().public_bytes(
            serialization.Encoding.Raw,
            serialization.PublicFormat.Raw) for k in keys]
        block_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        enc, msg = self._encode_justification(9, 4, block_hash, 4096, keys,
                                              pubs, n_sign)
        return enc, msg, pubs, block_hash

    def test_decode_round_trip(self):
        enc, msg, pubs, block_hash = self._mk()
        j = grandpa.decode_grandpa_justification(enc)
        assert j.round == 9
        assert j.target_hash == block_hash and j.target_number == 4096
        assert len(j.precommits) == 5
        assert j.precommits[0].pubkey == pubs[0]
        assert len(j.precommits[0].signature) == 64

    def test_finality_proof_wrapper(self):
        enc, _, _, block_hash = self._mk()
        fp = block_hash + scale.encode_compact_u32(len(enc)) + enc
        fp += scale.encode_compact_u32(0)  # unknown_headers: []
        bh, j = grandpa.decode_finality_proof(fp)
        assert bh == block_hash and j.target_number == 4096

    def test_align_matches_indexer_record(self):
        enc, msg, pubs, _ = self._mk()
        j = grandpa.decode_grandpa_justification(enc)
        rec = grandpa.align_justification(j, pubs, 4, verify=False)
        assert rec.block_number == 4096
        assert rec.pubkeys == [p.hex() for p in pubs]
        assert rec.validator_signed == [True] * 5 + [False]
        assert rec.signatures[5] == grandpa.DUMMY_SIGNATURE.hex()
        assert rec.signed_message == msg.hex()

    def test_align_verifies_signatures_on_device(self):
        enc, _, pubs, _ = self._mk(n_auth=4, n_sign=3)
        j = grandpa.decode_grandpa_justification(enc)
        rec = grandpa.align_justification(j, pubs, 4, verify=True)
        assert sum(rec.validator_signed) == 3
        # a corrupted signature must be rejected
        bad = bytearray(enc)
        bad[44 + 1 + 36] ^= 1  # first precommit's signature byte
        # (compact count of 3 precommits encodes in 1 byte)
        jb = grandpa.decode_grandpa_justification(bytes(bad))
        with pytest.raises(AssertionError):
            grandpa.align_justification(jb, pubs, 4, verify=True)


class TestStarkEntrypointGlue:
    """Host glue feeding stark/statements.py from service records (the
    heavy prove paths themselves are covered by test_statements*.py)."""

    def test_justification_host_inputs(self):
        from vectorx_tpu.services.entrypoint import _justification_host_inputs
        from vectorx_tpu.services.store import StoredJustification

        keys = [Ed25519PrivateKey.generate() for _ in range(3)]
        pubs = [k.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
            for k in keys]
        msg = scale.encode_precommit_bytes(bytes(32), 99, 5, 1)
        sigs = [keys[0].sign(msg), bytes(64), keys[2].sign(msg)]
        rec = StoredJustification(
            block_number=99, signed_message=msg.hex(),
            pubkeys=[p.hex() for p in pubs],
            signatures=[s.hex() for s in sigs],
            num_authorities=3, validator_signed=[True, False, True])
        auths, out_sigs, round_ = _justification_host_inputs(rec)
        assert auths == pubs
        assert out_sigs[0] == sigs[0] and out_sigs[2] == sigs[2]
        assert out_sigs[1] is None
        assert round_ == 5

    def test_default_max_chunks(self):
        from vectorx_tpu.services.entrypoint import _default_max_chunks
        assert _default_max_chunks([b"x" * 100]) == 2
        assert _default_max_chunks([b"x" * 250]) == 2
        # 252 needs the +4 safety margin -> 3 chunks
        assert _default_max_chunks([b"x" * 252]) == 2
        assert _default_max_chunks([b"x" * 253]) == 3
        assert _default_max_chunks([b"x" * 300, b"x" * 120]) == 3


class TestFixtureSource:
    """The offline fixture-dir format driving the prove CLI hermetically
    (entrypoint.FixtureSource; replaces the reference's live-Avail env for
    CI — SURVEY.md §4 'snapshot chain data into offline fixtures')."""

    def _make_dir(self, tmp_path, n_blocks=30):
        import json
        src = FakeSource(n_blocks)
        meta = {"last_justified": {"7": 25},
                "authority_set_id": {"25": 7},
                "authorities": {"25": [bytes([i] * 32).hex()
                                       for i in range(4)]}}
        for b in range(n_blocks):
            (tmp_path / f"{b}.header").write_text(src.get_header(b).hex())
        (tmp_path / "meta.json").write_text(json.dumps(meta))
        (tmp_path / "justifications.json").write_text("{}")
        return src

    def test_dummy_programs_via_fixture_dir(self, tmp_path):
        from vectorx_tpu.services.entrypoint import FixtureSource, run_program
        fake = self._make_dir(tmp_path)
        fs = FixtureSource(str(tmp_path))
        assert fs.get_header(12) == fake.get_header(12)
        assert fs.get_roots_range(10, 20) == fake.get_roots_range(10, 20)
        assert fs.last_justified_block(7) == 25
        assert fs.get_authority_set_id(25) == 7

        inp = HeaderRangeInput(10, bytes(32), 7, bytes(32), 25)
        out = run_program("dummy_header_range", inp.encode(), fs,
                          tree_size=16)
        want = dummy.dummy_header_range(inp.encode(), fake, 16)
        assert out == want

        rinp = RotateInput(7, bytes(32))
        out2 = run_program("dummy_rotate", rinp.encode(), fs)
        assert out2 == commitments.authority_set_hash(
            fs.get_authorities(25))


class TestBuildVerb:
    """The real build verb: circuit-artifact manifest + vk digests
    (reference build semantics: compile+serialize, succinct.json:6-9)."""

    def test_manifest_written_and_deterministic(self, tmp_path):
        from vectorx_tpu.services.entrypoint import build_program
        d1, d2 = tmp_path / "a", tmp_path / "b"
        m1 = build_program("header_range", tree_size=4, max_chunks=2,
                           artifacts_dir=str(d1), max_authorities=4)
        m2 = build_program("header_range", tree_size=4, max_chunks=2,
                           artifacts_dir=str(d2), max_authorities=4)
        assert set(m1["airs"]) == {"header", "range_merkle",
                                   "authority_chain", "ed25519_shard",
                                   "sha512_challenge_shard"}
        for name in m1["airs"]:
            assert m1["airs"][name]["vk_sha256"] == \
                m2["airs"][name]["vk_sha256"]
            assert m1["airs"][name]["rows"] > 0
            assert m1["airs"][name]["cols"] > 0
        import json as _json
        on_disk = _json.load(open(d1 / "manifest.json"))
        assert on_disk["airs"] == m1["airs"]
        # config round-trips
        from vectorx_tpu.stark import serialize
        from vectorx_tpu.stark.prover import StarkConfig
        cfg = serialize.deserialize_config(
            (d1 / "config.json").read_bytes(), StarkConfig)
        assert cfg == StarkConfig()

    def test_vk_digest_binds_shape(self, tmp_path):
        from vectorx_tpu.services.entrypoint import build_program
        m1 = build_program("header_range", tree_size=4, max_chunks=2,
                           artifacts_dir=str(tmp_path / "a"),
                           max_authorities=4)
        m2 = build_program("header_range", tree_size=4, max_chunks=3,
                           artifacts_dir=str(tmp_path / "b"),
                           max_authorities=4)
        assert m1["airs"]["header"]["vk_sha256"] != \
            m2["airs"]["header"]["vk_sha256"]

    def test_rotate_build(self, tmp_path):
        from vectorx_tpu.services.entrypoint import build_program
        m = build_program("rotate", tree_size=4, max_chunks=2,
                          artifacts_dir=str(tmp_path), max_authorities=4)
        assert "rotate_header" in m["airs"]


class TestHintWiredFetch:
    """Witness fetch goes through the hint runtime (HintRegistry /
    WitnessBuilder) — the production path, not a parity shim."""

    def test_fetch_header_range_witness(self):
        from vectorx_tpu.stark.hints import fetch_header_range_witness

        class Source:
            def __init__(self):
                self.calls = []

            def get_header(self, b):
                self.calls.append(("h", b))
                return b"H%d" % b

            def get_justification_record(self, b):
                self.calls.append(("j", b))
                return {"block": b}

        src = Source()
        headers, rec = fetch_header_range_witness(src, 10, 80)
        assert headers == [b"H%d" % b for b in range(11, 81)]
        assert rec == {"block": 80}

    def test_batched_source_method_preferred(self):
        from vectorx_tpu.stark.hints import fetch_header_range_witness

        class Source:
            def __init__(self):
                self.range_calls = []

            def get_headers_range(self, s, e):
                self.range_calls.append((s, e))
                return [b"H%d" % b for b in range(s, e + 1)]

            def get_header(self, b):
                raise AssertionError("batched path not used")

            def get_justification_record(self, b):
                return b

        src = Source()
        headers, rec = fetch_header_range_witness(src, 0, 100)
        assert len(headers) == 100 and rec == 100
        assert src.range_calls[0] == (1, 32)

    def test_fetch_rotate_witness(self):
        from vectorx_tpu.stark.hints import fetch_rotate_witness

        class Source:
            def get_rotate_data(self, sid):
                return (25, b"HDR", 4, 3, [b"\x01" * 32])

            def get_justification_record(self, b):
                assert b == 25
                return {"block": b}

        rot, rec = fetch_rotate_witness(Source(), 7)
        assert rot[0] == 25 and rec == {"block": 25}


def test_golden_dummy_fixtures_offline():
    """Offline slice of the reference's pinned golden vectors
    (dummy_header_range.rs:63-76, dummy_rotate.rs:40-53): the full
    input→output recompute needs live Avail chain data for blocks
    246150..246330 (the reference repo itself ships no chain fixtures —
    its own test is `#[cfg_attr(feature = "ci", ignore)]`-gated the same
    way). What IS derivable offline and asserted here:

    - input parsing: every field of both golden inputs decodes to the
      documented reference values (byte offsets/endianness parity);
    - output ABI: the golden 96-byte output splits into the three 32-byte
      components and re-encodes byte-identically (concatenation parity
      with DummyHeaderRange::run's output builder)."""
    from vectorx_tpu.circuits.abi import (HeaderRangeInput,
                                          HeaderRangeOutput, RotateInput)

    inp = HeaderRangeInput.decode(bytes.fromhex(GOLDEN_HR_INPUT))
    assert inp.trusted_block == 0x0003C186 == 246150
    assert inp.target_block == 0x0003C23A == 246330
    assert inp.authority_set_id == 0x75
    assert inp.trusted_header_hash.hex() == (
        "95f303b01e4834da35e5fdc3971fe297d1b48feb0c3f330491639136a6ada598")
    assert inp.authority_set_hash.hex() == GOLDEN_HR_INPUT[88:152]

    out = HeaderRangeOutput.decode(bytes.fromhex(GOLDEN_HR_OUTPUT))
    assert out.target_header_hash.hex() == GOLDEN_HR_OUTPUT[0:64]
    assert out.state_root_commitment.hex() == GOLDEN_HR_OUTPUT[64:128]
    assert out.data_root_commitment.hex() == GOLDEN_HR_OUTPUT[128:192]
    assert out.encode().hex() == GOLDEN_HR_OUTPUT

    rot = RotateInput.decode(bytes.fromhex(GOLDEN_ROT_INPUT)[:40])
    assert rot.authority_set_id == 0x75
    assert rot.authority_set_hash.hex() == GOLDEN_ROT_INPUT[16:80]
    assert len(bytes.fromhex(GOLDEN_ROT_OUTPUT)) == 32
