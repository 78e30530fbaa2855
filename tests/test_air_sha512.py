"""SHA-512 challenge AIR: h = SHA-512(R‖A‖M) mod L proven in-STARK
(closes the Ed25519 lanes' host-side challenge seam — the reference's
Curta EdDSA gadget computes the same internally,
justification.rs:237-243)."""

import hashlib

import numpy as np

from vectorx_tpu.circuits.ed25519 import L_ORDER
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import air_sha512 as a512
from vectorx_tpu.stark.air import check_constraints

from test_air_ed25519 import make_signature

MSG = b"vectorx precommit message of fifty-three bytes..!#%&("
assert len(MSG) == 53


def _fp(publics):
    return [gl.to_fp(int(p)) for p in publics]


def _build(lanes):
    air = a512.Sha512ChallengeAir(lanes, MSG, B=8)
    trace, publics = air.make_trace()
    return air, trace, publics


def test_single_lane_constraints_and_digest():
    sig = make_signature(MSG, 7)
    a, r, s, h = sig
    # the witness h really is the Ed25519 challenge for this lane
    assert h == int.from_bytes(hashlib.sha512(r + a + MSG).digest(),
                               "little") % L_ORDER
    air, trace, publics = _build([sig])
    assert check_constraints(air, trace, _fp(publics))


def test_dummy_lane_padding():
    air, trace, publics = _build([])        # all-dummy
    assert publics[0] == 0
    assert check_constraints(air, trace, _fp(publics))


def test_reject_tampered_digest_byte():
    air, trace, publics = _build([make_signature(MSG, 8)])
    row = a512.R_RED + 3
    lo = trace[0].at[a512.DB, row].set(trace[0][a512.DB, row] ^ np.uint32(1))
    assert not check_constraints(air, (lo, trace[1]), _fp(publics))


def test_reject_tampered_round_bit():
    air, trace, publics = _build([make_signature(MSG, 9)])
    lo = trace[0].at[a512.A + 5, 40].set(
        trace[0][a512.A + 5, 40] ^ np.uint32(1))
    assert not check_constraints(air, (lo, trace[1]), _fp(publics))


def test_wrong_h_has_no_witness():
    """A lane whose h is NOT the digest residue admits no exact q — the
    witness builder refuses (and no q exists: q·L + h = D has a unique
    (q, h) with h in a fixed residue class)."""
    import pytest
    a, r, s, h = make_signature(MSG, 10)
    bad = (a, r, s, (h + 1) % L_ORDER)
    air = a512.Sha512ChallengeAir([bad], MSG, B=8)
    with pytest.raises(AssertionError):
        air.make_trace()


def test_ed25519_dummy_lane_mapped():
    """Shard padding lanes (air_ed25519.dummy_sig, h = 0) carry no hash
    binding — they map deterministically to this AIR's own consistent
    dummy (statements._check_lanes pins unsigned lanes to the exact
    dummy tuple, so the substitution cannot be abused)."""
    from vectorx_tpu.stark.air_ed25519 import dummy_sig
    sig = make_signature(MSG, 11)
    air = a512.Sha512ChallengeAir([sig, dummy_sig()], MSG, B=9)
    trace, publics = air.make_trace()
    assert check_constraints(air, trace, _fp(publics))
    # deterministic reconstruction gives the identical publics
    air2 = a512.Sha512ChallengeAir([sig, dummy_sig()], MSG, B=9)
    assert air2.publics_list() == air.publics_list()
