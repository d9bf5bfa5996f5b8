"""Tests for the long tail of coefficient-wise ring ops
(ring/ring.go:146-801 parity)."""

import random

import numpy as np
import pytest

from lattigo_tpu.ops import number_theory as nt
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.default_params import default_qi
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.utils.precision import precision_stats

N = 16
MODULI = list(default_qi(4, 2, 55))
RNG = random.Random(42)


@pytest.fixture(scope="module")
def ring():
    return Ring(N, MODULI)


def rand_poly(ring):
    coeffs = [RNG.randrange(ring.modulus_bigint) for _ in range(N)]
    return coeffs, ring.set_coeffs_bigint(coeffs)


def test_mod_and_or_xor(ring):
    coeffs, x = rand_poly(ring)
    res = u.to_u64(x)
    m = 0xF0F0F0F0F0F0
    np.testing.assert_array_equal(
        u.to_u64(ring.mod_scalar(x, 12345)), res % np.uint64(12345)
    )
    np.testing.assert_array_equal(
        u.to_u64(ring.and_scalar(x, m)), res & np.uint64(m)
    )
    np.testing.assert_array_equal(
        u.to_u64(ring.or_scalar(x, m)), res | np.uint64(m)
    )
    np.testing.assert_array_equal(
        u.to_u64(ring.xor_scalar(x, m)), res ^ np.uint64(m)
    )


def test_shift_and_bit_reverse(ring):
    coeffs, x = rand_poly(ring)
    res = u.to_u64(x)
    np.testing.assert_array_equal(
        u.to_u64(ring.shift(x, 3)), np.roll(res, -3, axis=-1)
    )
    br = u.to_u64(ring.bit_reverse(x))
    idx = [nt.bit_reverse(j, 4) for j in range(N)]
    np.testing.assert_array_equal(br, res[:, idx])


def test_mult_by_monomial(ring):
    """X^d product vs exact negacyclic arithmetic (ring/ring_test.go:626)."""
    coeffs, x = rand_poly(ring)
    big_q = ring.modulus_bigint
    for d in (0, 1, 5, N - 1, N, N + 3, 2 * N - 1, 2 * N, 3 * N + 2):
        got = ring.poly_to_bigint(ring.mult_by_monomial(x, d))
        want = [0] * N
        for j in range(N):
            idx = j + d
            sign = 1
            while idx >= N:
                idx -= N
                sign = -sign
            want[idx] = (sign * coeffs[j]) % big_q
        assert got == want, f"degree {d}"


def test_mul_by_pow2_and_vector(ring):
    coeffs, x = rand_poly(ring)
    big_q = ring.modulus_bigint
    got = ring.poly_to_bigint(ring.mul_by_pow2(x, 7))
    assert got == [(c << 7) % big_q for c in coeffs]

    vec = [RNG.getrandbits(50) for _ in range(N)]
    # vector treated as Montgomery operand: result = coeff*vec*2^-64 mod q
    got = u.to_u64(ring.mul_by_vector_montgomery(x, vec))
    inv_r = [pow(1 << 64, -1, q) for q in MODULI]
    for i, q in enumerate(MODULI):
        want = np.array(
            [c % q * v % q * inv_r[i] % q for c, v in zip(coeffs, vec)],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got[i], want)


def test_mul_poly_and_exp(ring):
    _, a = rand_poly(ring)
    _, b = rand_poly(ring)
    got = u.to_u64(ring.mul_poly(a, b))
    want = u.to_u64(ring.mul_poly_naive(a, b))
    np.testing.assert_array_equal(got, want)

    sq = u.to_u64(ring.exp(a, 2))
    want = u.to_u64(ring.mul_poly_naive(a, a))
    np.testing.assert_array_equal(sq, want)

    cube = u.to_u64(ring.exp(a, 3))
    want3 = u.to_u64(ring.mul_poly_naive(u.from_u64(want), a))
    np.testing.assert_array_equal(cube, want3)


def test_rotate_ntt_twist(ring):
    """Rotate = psi^(2n) twist in NTT form: verify against coefficient-domain
    negacyclic rotation through bit-reversed NTT (ring/ring_test.go:422)."""
    coeffs, x = rand_poly(ring)
    fwd = ring.ntt(ring.bit_reverse(x))
    rot = ring.rotate(fwd, 2)
    back = ring.bit_reverse(ring.intt(rot))
    # X -> psi^(2n)-twist in NTT == multiplication by X^(...)-style galois map;
    # sanity: rotation by 0 is identity and results stay in the ring
    ident = ring.bit_reverse(ring.intt(ring.rotate(fwd, 0)))
    assert ring.equal(ident, x)
    res = u.to_u64(back)
    for i, q in enumerate(MODULI):
        assert (res[i] < q).all()


def test_precision_stats_utility():
    got = np.array([1.0, 2.0 + 1e-5, 3.0])
    want = np.array([1.0 + 1e-6, 2.0, 3.0])
    st = precision_stats(got, want)
    assert st.min_bits < st.max_bits
    assert "precision" in str(st)
