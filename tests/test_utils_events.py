import asyncio

import numpy as np
import pytest

from vectorx_tpu.utils.xxhash import xxhash64, twox128, storage_key
from vectorx_tpu.services import events
from vectorx_tpu.services.store import InMemoryStore
from vectorx_tpu.services.avail_rpc import (reencode_header_from_json,
                                            decode_grandpa_authorities)
from vectorx_tpu.circuits import scale


class TestXxhash:
    def test_twox128_known_substrate_prefixes(self):
        # well-known substrate storage prefixes
        assert twox128(b"System").hex() == "26aa394eea5630e07c48ae0c9558cef7"
        assert twox128(b"Account").hex() == "b99d880ec681799c0cf30e8886371da9"

    def test_xxhash64_spot(self):
        # xxhash64 of empty input with seed 0 is the canonical value
        assert xxhash64(b"", 0) == 0xEF46DB3751D8E999

    def test_storage_key(self):
        k = storage_key("Grandpa", "CurrentSetId")
        assert len(k) == 32
        assert k[:16] == twox128(b"Grandpa")


class TestHeaderReencode:
    def test_round_trip_via_decoder(self):
        parent = bytes(range(32))
        state = bytes(range(32, 64))
        extrinsics = bytes(range(64, 96))
        logs = ["0x04ff", "0x00"]
        h = {
            "parentHash": "0x" + parent.hex(),
            "number": hex(300),
            "stateRoot": "0x" + state.hex(),
            "extrinsicsRoot": "0x" + extrinsics.hex(),
            "digest": {"logs": logs},
        }
        enc = reencode_header_from_json(h)
        dec = scale.decode_header_bytes(enc)
        assert dec["parent_hash"] == parent
        assert dec["block_number"] == 300
        assert dec["state_root"] == state

    def test_decode_grandpa_authorities(self):
        pks = [bytes([i] * 32) for i in range(3)]
        data = scale.encode_compact_u32(3)
        for pk in pks:
            data += pk + (1).to_bytes(8, "little")
        assert decode_grandpa_authorities(data) == pks


class FakeEth:
    def __init__(self, head, logs_by_range):
        self.head = head
        self.logs_by_range = logs_by_range
        self.calls = []

    async def latest_block_number(self):
        return self.head

    async def get_logs(self, address, topic0, from_block, to_block):
        self.calls.append((from_block, to_block))
        out = []
        for (blk, data) in self.logs_by_range:
            if from_block <= blk <= to_block:
                out.append({"data": data})
        return out


class TestEventsIndexer:
    def test_poll_decodes_and_stores(self):
        ev_data = "0x" + (
            (100).to_bytes(32, "big") + (200).to_bytes(32, "big")
            + bytes([7] * 32) + bytes([9] * 32) + (256).to_bytes(32, "big")
        ).hex()
        eth = FakeEth(head=120_000, logs_by_range=[(60_000, ev_data)])
        store = InMemoryStore()
        n = asyncio.run(events.poll_once(eth, store, "0xabc", deploy_block=0))
        assert n == 1
        data_c, state_c = store.get_block_range_data(100, 200)
        assert data_c == bytes([7] * 32)
        assert state_c == bytes([9] * 32)
        # batched in <=50k windows
        assert eth.calls[0] == (0, 49_999)
        assert len(eth.calls) == 3
        # cursor advanced; next poll scans only the tail
        eth.calls.clear()
        asyncio.run(events.poll_once(eth, store, "0xabc", deploy_block=0))
        assert eth.calls == []  # head unchanged -> nothing to scan

    def test_event_topic_shape(self):
        assert events.EVENT_TOPIC.startswith("0x")
        assert len(events.EVENT_TOPIC) == 66
