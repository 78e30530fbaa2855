"""vectorx_tpu — a TPU-native ZK proving framework with the capabilities of
the VectorX light client (reference: AsherBond/0-kno-vectorx).

Layer map (bottom-up), mirroring SURVEY.md §1/§7:

- ``field``    — Goldilocks GF(p) / GF(p^2) arithmetic as uint32-pair vector ops
- ``hashes``   — Poseidon (transcript), SHA-256 and Blake2b-256 (batched, bit-exact)
- ``poly``     — NTT / LDE over Goldilocks
- ``stark``    — AIR constraint system, Merkle commitments, FRI, prover/verifier
- ``ops``      — Pallas TPU kernels for the hot paths
- ``circuits`` — VectorX domain logic: SCALE decode, header-chain/justification/
                 rotate verification, public-input commitments (bit-exact parity
                 with the reference's on-chain semantics)
- ``parallel`` — device-mesh sharding (map-reduce over header batches, sharded NTT)
- ``services`` — operator / indexer / events daemons (host side)
"""

__version__ = "0.1.0"
