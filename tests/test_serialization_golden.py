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
