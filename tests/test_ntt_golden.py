"""Bit-exact NTT verification against the reference's golden vectors.

Mirrors ring/ntt_test.go:101-142: forward NTT must equal the stored NTT
vectors exactly, and the inverse NTT must round-trip to the input exactly.
"""

import os

import numpy as np
import pytest

from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.ring import Ring

DATA = "/root/reference/ring/test_data"

FILES60 = [
    "test_pol_60____8_2",
    "test_pol_60___16_2",
    "test_pol_60___32_2",
    "test_pol_60___64_2",
    "test_pol_60__128_2",
    "test_pol_60__256_2",
    "test_pol_60__512_2",
]


def load_vectors(name):
    with open(os.path.join(DATA, name)) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n = int(lines[0])
    moduli = [int(x) for x in lines[1].split()]
    coeffs = np.array(
        [[int(x) for x in lines[2 + i].split()] for i in range(len(moduli))],
        dtype=np.uint64,
    )
    assert coeffs.shape == (len(moduli), n)
    return n, moduli, coeffs


@pytest.mark.parametrize("name", FILES60)
def test_ntt_golden_60(name):
    n, moduli, coeffs = load_vectors(name)
    _, _, ntt_coeffs = load_vectors(name.replace("test_pol_", "test_pol_NTT_"))

    ring = Ring(n, moduli)
    x = u.from_u64(coeffs)

    fwd = ring.ntt(x)
    np.testing.assert_array_equal(u.to_u64(fwd), ntt_coeffs)

    inv = ring.intt(fwd)
    np.testing.assert_array_equal(u.to_u64(inv), coeffs)


def test_ntt_batched_matches_single():
    n, moduli, coeffs = load_vectors(FILES60[2])
    ring = Ring(n, moduli)
    batch = np.stack([coeffs, (coeffs + np.uint64(1)) % np.array(moduli, dtype=np.uint64)[:, None]])
    out = u.to_u64(ring.ntt(u.from_u64(batch)))
    for i in range(2):
        single = u.to_u64(ring.ntt(u.from_u64(batch[i])))
        np.testing.assert_array_equal(out[i], single)


def test_mul_poly_ntt_vs_naive():
    """NTT-domain multiply == schoolbook negacyclic convolution
    (ring/ring_test.go:503, MulPoly vs MulPolyNaive)."""
    n, moduli, coeffs = load_vectors(FILES60[1])  # N=16, fast naive check
    ring = Ring(n, moduli)
    rng = np.random.default_rng(7)
    a = rng.integers(0, moduli[0], size=(len(moduli), n)).astype(np.uint64) % np.array(
        moduli, dtype=np.uint64
    )[:, None]
    b = rng.integers(0, moduli[0], size=(len(moduli), n)).astype(np.uint64) % np.array(
        moduli, dtype=np.uint64
    )[:, None]

    fa = ring.ntt(u.from_u64(a))
    fb = ring.ntt(u.from_u64(b))
    prod = ring.mul_coeffs_montgomery(ring.mform(fa), fb)
    got = u.to_u64(ring.intt(prod))

    for i, q in enumerate(moduli):
        want = np.zeros(n, dtype=object)
        for j in range(n):
            for k in range(n):
                t = int(a[i, j]) * int(b[i, k]) % q
                idx = j + k
                if idx >= n:
                    want[idx - n] = (want[idx - n] - t) % q
                else:
                    want[idx] = (want[idx] + t) % q
        np.testing.assert_array_equal(got[i], want.astype(np.uint64))
