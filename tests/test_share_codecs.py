"""Reference-format protocol share codecs: byte-golden tests.

The expected bytes are built by an INDEPENDENT transcription of the Go
marshalers (dbfv/publickey_gen.go:21, keyswitching.go:20,
public_keyswitching.go:30, relinkey_gen.go:28/69/130, rotkey_gen.go:29,
public_refresh.go:32) on tiny inputs, so a format drift in the production
codec cannot cancel out.  Poly layout per ring/ring_object.go:161-289:
[log2(N) u8][#moduli u8] then big-endian uint64 coefficient rows.
"""

import struct

import numpy as np
import pytest

from lattigo_tpu.ops import u64 as u
from lattigo_tpu.utils import serialization as ser

N = 8
MODULI = [97, 113]


def _poly(seed):
    rng = np.random.default_rng(seed)
    arr = np.stack([rng.integers(0, q, N, dtype=np.uint64) for q in MODULI])
    return u.from_u64(arr), arr


def _go_poly_bytes(arr) -> bytes:
    # ring/ring_object.go WriteTo with metadata: logN, #levels, rows
    return bytes([3, len(MODULI)]) + arr.astype(">u8").tobytes()


def _stack(pairs):
    import jax.numpy as jnp

    return (
        jnp.stack([p[0] for p in pairs]),
        jnp.stack([p[1] for p in pairs]),
    )


def test_ckg_cks_share_bytes():
    p, arr = _poly(0)
    want = _go_poly_bytes(arr)
    assert ser.ckg_share_to_bytes(p) == want
    assert ser.cks_share_to_bytes(p) == want
    back = ser.ckg_share_from_bytes(want)
    np.testing.assert_array_equal(u.to_u64(back), arr)


def test_pcks_share_bytes():
    p0, a0 = _poly(1)
    p1, a1 = _poly(2)
    want = _go_poly_bytes(a0) + _go_poly_bytes(a1)
    assert ser.pcks_share_to_bytes((p0, p1)) == want
    b0, b1 = ser.pcks_share_from_bytes(want)
    np.testing.assert_array_equal(u.to_u64(b0), a0)
    np.testing.assert_array_equal(u.to_u64(b1), a1)


def test_rkg_round1_round3_share_bytes():
    pairs = [_poly(i) for i in (3, 4, 5)]
    share = _stack([p for p, _ in pairs])
    want = bytes([3]) + b"".join(_go_poly_bytes(a) for _, a in pairs)
    assert ser.rkg_round1_share_to_bytes(share) == want
    assert ser.rkg_round3_share_to_bytes(share) == want
    back = ser.rkg_round1_share_from_bytes(want)
    for i, (_, a) in enumerate(pairs):
        np.testing.assert_array_equal(u.to_u64((back[0][i], back[1][i])), a)


def test_rkg_round2_share_bytes():
    pa = [_poly(i) for i in (6, 7)]
    pb = [_poly(i) for i in (8, 9)]
    share = (_stack([p for p, _ in pa]), _stack([p for p, _ in pb]))
    want = bytes([2])
    for (_, a), (_, b) in zip(pa, pb):
        want += _go_poly_bytes(a) + _go_poly_bytes(b)
    assert ser.rkg_round2_share_to_bytes(share) == want
    s0, s1 = ser.rkg_round2_share_from_bytes(want)
    np.testing.assert_array_equal(u.to_u64((s0[0][1], s0[1][1])), pa[1][1])
    np.testing.assert_array_equal(u.to_u64((s1[0][0], s1[1][0])), pb[0][1])


def test_rtg_share_bytes():
    pairs = [_poly(i) for i in (10, 11)]
    share = _stack([p for p, _ in pairs])
    k, rot_type = 5, ser.ROTATION_LEFT
    ring_len = len(_go_poly_bytes(pairs[0][1]))
    want = struct.pack(">QQQ", k, rot_type, ring_len)
    want += b"".join(_go_poly_bytes(a) for _, a in pairs)
    assert ser.rtg_share_to_bytes(k, rot_type, share) == want
    gk, gt, back = ser.rtg_share_from_bytes(want)
    assert (gk, gt) == (k, rot_type)
    np.testing.assert_array_equal(u.to_u64((back[0][1], back[1][1])), pairs[1][1])


def test_refresh_share_bytes():
    p0, a0 = _poly(12)
    p1, a1 = _poly(13)
    d = _go_poly_bytes(a0)
    r = _go_poly_bytes(a1)
    want = struct.pack(">QQ", len(d), len(r)) + d + r
    assert ser.refresh_share_to_bytes((p0, p1)) == want
    b0, b1 = ser.refresh_share_from_bytes(want)
    np.testing.assert_array_equal(u.to_u64(b0), a0)
    np.testing.assert_array_equal(u.to_u64(b1), a1)


def test_roundtrip_through_protocol_shapes():
    """End-to-end: real dbfv protocol shares survive the reference-format
    codecs bit for bit."""
    import jax

    from lattigo_tpu.models import bfv, dbfv
    from lattigo_tpu.utils.prng import CRPGenerator

    params = bfv.Parameters(
        log_n=8, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
    ).gen_from_log_moduli()
    ctx = bfv.get_context(params)
    kg = bfv.KeyGenerator(params, rng_key=jax.random.key(1))
    sk = kg.gen_secret_key()
    crpg = CRPGenerator(b"t", ctx.ring_qp)
    crpg.seed(b"s")
    crp = crpg.clock_poly()
    ckg = dbfv.CKGProtocol(params, rng_key=jax.random.key(2))
    share = ckg.gen_share(sk.sk, crp)
    back = ser.ckg_share_from_bytes(ser.ckg_share_to_bytes(share))
    np.testing.assert_array_equal(u.to_u64(back), u.to_u64(share))
