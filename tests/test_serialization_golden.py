"""Byte-level golden tests for the wire codecs.

No Go toolchain exists in this image, so the expected byte strings are
constructed HERE, independently of lattigo_tpu's codecs, by following the
reference marshaler code literally:

* Poly        — ring/ring_object.go:160-176 (WriteTo): ``[log2(N)][#moduli]``
                then per-modulus rows of big-endian uint64 coefficients
                (WriteCoeffsTo, :146-157).
* Ciphertext  — bfv/marshaler.go:9-31: ``[#polys][isNTT]`` then each poly.
* SecretKey   — bfv/marshaler.go:80-99: the bare poly bytes.
* PublicKey   — bfv/marshaler.go:118-146: both polys back to back.

This pins the writer to the reference format (not merely to itself, which
is all a round-trip test proves).
"""

import struct

import numpy as np

from lattigo_tpu.ops import u64 as u
from lattigo_tpu.utils import serialization as ser


def _reference_poly_bytes(coeffs: np.ndarray) -> bytes:
    """Literal transcription of ring/ring_object.go WriteTo."""
    L, n = coeffs.shape
    data = bytearray()
    data.append(n.bit_length() - 1)  # bits.Len64(N) - 1
    data.append(L)
    for i in range(L):
        for j in range(n):
            data += struct.pack(">Q", int(coeffs[i, j]))
    return bytes(data)


def test_poly_bytes_match_reference_format():
    rng = np.random.default_rng(0)
    coeffs = rng.integers(0, 1 << 60, size=(3, 16), dtype=np.uint64)
    want = _reference_poly_bytes(coeffs)
    got = ser.poly_to_bytes(u.from_u64(coeffs))
    assert got == want
    back, consumed = ser.poly_from_bytes(want)
    assert consumed == len(want) == 2 + 3 * 16 * 8
    np.testing.assert_array_equal(u.to_u64(back), coeffs)


def test_ciphertext_bytes_match_reference_format():
    from lattigo_tpu.models.bfv.elements import Ciphertext

    rng = np.random.default_rng(1)
    c0 = rng.integers(0, 1 << 60, size=(2, 8), dtype=np.uint64)
    c1 = rng.integers(0, 1 << 60, size=(2, 8), dtype=np.uint64)
    ct = Ciphertext([u.from_u64(c0), u.from_u64(c1)], is_ntt=False)
    want = bytes([2, 0]) + _reference_poly_bytes(c0) + _reference_poly_bytes(c1)
    assert ser.bfv_ciphertext_to_bytes(ct) == want


def test_secret_and_public_key_bytes_match_reference_format():
    from lattigo_tpu.models.bfv.keygen import PublicKey, SecretKey

    rng = np.random.default_rng(2)
    s = rng.integers(0, 1 << 60, size=(2, 8), dtype=np.uint64)
    p0 = rng.integers(0, 1 << 60, size=(2, 8), dtype=np.uint64)
    p1 = rng.integers(0, 1 << 60, size=(2, 8), dtype=np.uint64)
    sk = SecretKey(u.from_u64(s))
    pk = PublicKey((u.from_u64(p0), u.from_u64(p1)))
    assert ser.secret_key_to_bytes(sk) == _reference_poly_bytes(s)
    assert ser.public_key_to_bytes(pk) == (
        _reference_poly_bytes(p0) + _reference_poly_bytes(p1)
    )


def _reference_swk_bytes(blocks) -> bytes:
    """Literal transcription of bfv/marshaler.go:248-273 (SwitchingKey
    encode): [beta u8] then per block poly0 bytes + poly1 bytes."""
    data = bytearray([len(blocks)])
    for k0, k1 in blocks:
        data += _reference_poly_bytes(k0)
        data += _reference_poly_bytes(k1)
    return bytes(data)


def _rand_swk(rng, beta, L, n):
    k0 = rng.integers(0, 1 << 60, size=(beta, L, n), dtype=np.uint64)
    k1 = rng.integers(0, 1 << 60, size=(beta, L, n), dtype=np.uint64)
    return k0, k1


def test_switching_key_bytes_match_reference_format():
    from lattigo_tpu.models.bfv.keygen import SwitchingKey

    rng = np.random.default_rng(3)
    k0, k1 = _rand_swk(rng, 3, 2, 8)
    swk = SwitchingKey(u.from_u64(k0), u.from_u64(k1))
    want = _reference_swk_bytes([(k0[i], k1[i]) for i in range(3)])
    assert ser.switching_key_to_bytes(swk) == want
    back, consumed = ser.switching_key_from_bytes(want, SwitchingKey)
    assert consumed == len(want)
    np.testing.assert_array_equal(u.to_u64(back.key0), k0)
    np.testing.assert_array_equal(u.to_u64(back.key1), k1)


def test_evaluation_key_bytes_match_reference_format():
    """bfv/marshaler.go:168-189: [#degrees u8] then each SwitchingKey."""
    from lattigo_tpu.models.bfv.keygen import EvaluationKey, SwitchingKey

    rng = np.random.default_rng(4)
    k0a, k1a = _rand_swk(rng, 2, 2, 8)
    k0b, k1b = _rand_swk(rng, 2, 2, 8)
    evk = EvaluationKey([
        SwitchingKey(u.from_u64(k0a), u.from_u64(k1a)),
        SwitchingKey(u.from_u64(k0b), u.from_u64(k1b)),
    ])
    want = bytes([2])
    want += _reference_swk_bytes([(k0a[i], k1a[i]) for i in range(2)])
    want += _reference_swk_bytes([(k0b[i], k1b[i]) for i in range(2)])
    assert ser.evaluation_key_to_bytes(evk) == want
    back = ser.evaluation_key_from_bytes(want, EvaluationKey, SwitchingKey)
    np.testing.assert_array_equal(u.to_u64(back.evakey[1].key0), k0b)


def test_rotation_keys_bytes_match_reference_format():
    """bfv/marshaler.go:330-385: records [type u8][k u24] + SwitchingKey;
    RotationRight=1, RotationLeft=2, RotationRow=3 (bfv/keygen.go:40-45),
    the row record's 3 index bytes left zero."""
    from lattigo_tpu.models.bfv.keygen import RotationKeys, SwitchingKey

    rng = np.random.default_rng(5)
    kl0, kl1 = _rand_swk(rng, 2, 2, 8)
    kr0, kr1 = _rand_swk(rng, 2, 2, 8)
    kw0, kw1 = _rand_swk(rng, 2, 2, 8)
    rk = RotationKeys()
    rk.left[5] = SwitchingKey(u.from_u64(kl0), u.from_u64(kl1))
    rk.right[260] = SwitchingKey(u.from_u64(kr0), u.from_u64(kr1))
    rk.row = SwitchingKey(u.from_u64(kw0), u.from_u64(kw1))
    want = bytes([2]) + (5).to_bytes(3, "big")
    want += _reference_swk_bytes([(kl0[i], kl1[i]) for i in range(2)])
    want += bytes([1]) + (260).to_bytes(3, "big")
    want += _reference_swk_bytes([(kr0[i], kr1[i]) for i in range(2)])
    want += bytes([3, 0, 0, 0])
    want += _reference_swk_bytes([(kw0[i], kw1[i]) for i in range(2)])
    assert ser.rotation_keys_to_bytes(rk) == want
    back = ser.rotation_keys_from_bytes(want, RotationKeys, SwitchingKey)
    np.testing.assert_array_equal(u.to_u64(back.left[5].key0), kl0)
    np.testing.assert_array_equal(u.to_u64(back.right[260].key1), kr1)
    np.testing.assert_array_equal(u.to_u64(back.row.key0), kw0)


def test_bfv_parameters_bytes_match_reference_format():
    """bfv/params.go:263-285: [logN][#Qi][#Pi][#QiMul][T u64]
    [sigma*2^32 u64][Qi...][Pi...][QiMul...], all big-endian."""
    from lattigo_tpu.models import bfv

    params = bfv.default_params(bfv.PN12QP109)
    want = bytearray([params.log_n, len(params.qi), len(params.pi),
                      len(params.qi_mul)])
    want += struct.pack(">Q", params.t)
    want += struct.pack(">Q", int(params.sigma * (1 << 32)))
    for v in (*params.qi, *params.pi, *params.qi_mul):
        want += struct.pack(">Q", v)
    assert ser.bfv_parameters_to_bytes(params) == bytes(want)
    back = ser.bfv_parameters_from_bytes(bytes(want))
    assert back.qi == params.qi and back.t == params.t
    assert back.sigma == params.sigma


def test_ckks_parameters_bytes_match_reference_format():
    """ckks/params.go:270-291: [logN][logSlots][scale f64][sigma f64]
    [#Qi][#Pi][Qi...][Pi...], all big-endian."""
    from lattigo_tpu.models import ckks

    params = ckks.default_params(ckks.PN12QP109)
    want = bytearray([params.log_n, params.log_slots])
    want += struct.pack(">d", params.scale)
    want += struct.pack(">d", params.sigma)
    want += bytes([len(params.qi), len(params.pi)])
    for v in (*params.qi, *params.pi):
        want += struct.pack(">Q", v)
    assert ser.ckks_parameters_to_bytes(params) == bytes(want)
    back = ser.ckks_parameters_from_bytes(bytes(want))
    assert back.qi == params.qi and back.scale == params.scale
