"""Ring-layer tests mirroring ring/ring_test.go: basis extension vs exact CRT,
rescaling vs big-int reference, simple scaling vs rationals, Galois shifts,
sampler distributions, CRP determinism."""

import math
import random

import jax
import numpy as np
import pytest

from lattigo_tpu.ops import basis_ext, galois, number_theory as nt, samplers, scaling
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.utils.prng import PRNG, CRPGenerator

N = 32
Q_MODULI = nt.generate_ntt_primes(55, 5, 4)
P_MODULI = nt.generate_ntt_primes(60, 5, 2)


@pytest.fixture(scope="module")
def rings():
    return Ring(N, Q_MODULI), Ring(N, P_MODULI)


def rand_bigints(rng, bound, n):
    return [rng.randrange(bound) for _ in range(n)]


def test_mod_up_exact_vs_crt(rings):
    ring_q, ring_p = rings
    rng = random.Random(5)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    mp = basis_ext.ModUpParams(Q_MODULI, P_MODULI)
    got = u.to_u64(basis_ext.mod_up(x, mp))
    for j, p in enumerate(P_MODULI):
        want = np.array([c % p for c in coeffs], dtype=np.uint64)
        np.testing.assert_array_equal(got[j], want)


def test_mod_down_split_pq(rings):
    """(x*P + e) / P rounds back to x (ring_basis_extension ModDownSplitedPQ)."""
    ring_q, ring_p = rings
    rng = random.Random(6)
    big_p = ring_p.modulus_bigint
    xs = rand_bigints(rng, ring_q.modulus_bigint // 4, N)
    es = [rng.randrange(-(big_p // 4), big_p // 4) for _ in range(N)]
    vals = [x * big_p + e for x, e in zip(xs, es)]
    xq = ring_q.set_coeffs_bigint(vals)
    xp = ring_p.set_coeffs_bigint(vals)
    bx = basis_ext.FastBasisExtender(ring_q, ring_p)
    got = ring_q.poly_to_bigint(bx.mod_down_split_pq(xq, xp))
    for g, x, e in zip(got, xs, es):
        # floor((x*P+e)/P) = x + floor(e/P) in {x-1, x}
        assert g in (x, (x - 1) % ring_q.modulus_bigint), (g, x)


def test_mod_down_split_ntt_pq(rings):
    ring_q, ring_p = rings
    rng = random.Random(7)
    big_p = ring_p.modulus_bigint
    xs = rand_bigints(rng, ring_q.modulus_bigint // 4, N)
    vals = [x * big_p for x in xs]
    xq = ring_q.ntt(ring_q.set_coeffs_bigint(vals))
    xp = ring_p.ntt(ring_p.set_coeffs_bigint(vals))
    bx = basis_ext.FastBasisExtender(ring_q, ring_p)
    got = ring_q.poly_to_bigint(ring_q.intt(bx.mod_down_split_ntt_pq(xq, xp)))
    assert got == xs


def test_decomposer_reconstruction(rings):
    """sum_i D_i(c) * (Q_i block product) == c mod Q, plus P-basis consistency
    (the invariant behind ring_basis_extension.Decompose)."""
    ring_q, ring_p = rings
    rng = random.Random(8)
    dec = basis_ext.Decomposer(Q_MODULI, P_MODULI)
    level = ring_q.L - 1
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    for beta_idx in range(dec.beta):
        xq, xp = dec.decompose_and_split(level, beta_idx, x)
        gq = u.to_u64(xq)
        gp = u.to_u64(xp)
        start = beta_idx * dec.alpha
        nsrc = min(dec.alpha, level + 1 - start)
        block_mod = 1
        for k in range(nsrc):
            block_mod *= Q_MODULI[start + k]
        for col in range(N):
            # reconstruct the block value from its own residues
            v = 0
            for k in range(nsrc):
                qi = Q_MODULI[start + k]
                crt = block_mod // qi
                v += int(u.to_u64(x)[start + k, col]) * crt * pow(crt, -1, qi)
            v %= block_mod
            for j, qj in enumerate(Q_MODULI[: level + 1]):
                assert gq[j, col] == v % qj, (beta_idx, col, j)
            for j, pj in enumerate(P_MODULI):
                assert gp[j, col] == v % pj


def test_div_floor_round_by_last_modulus(rings):
    ring_q, _ = rings
    rng = random.Random(9)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    q_last = Q_MODULI[ring_q.L - 1]

    got = scaling.div_floor_by_last_modulus(ring_q, x)
    want = [c // q_last for c in coeffs]
    for i, qi in enumerate(Q_MODULI[:-1]):
        np.testing.assert_array_equal(
            u.to_u64(got)[i], np.array([w % qi for w in want], dtype=np.uint64)
        )

    got = scaling.div_round_by_last_modulus(ring_q, x)
    want = [(c + (q_last - 1) // 2) // q_last for c in coeffs]
    for i, qi in enumerate(Q_MODULI[:-1]):
        np.testing.assert_array_equal(
            u.to_u64(got)[i], np.array([w % qi for w in want], dtype=np.uint64)
        )


def test_div_by_last_modulus_ntt_matches_coeff(rings):
    ring_q, _ = rings
    rng = random.Random(10)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    xn = ring_q.ntt(x)
    a = u.to_u64(scaling.div_floor_by_last_modulus(ring_q, x))
    b = u.to_u64(ring_q.intt(scaling.div_floor_by_last_modulus_ntt(ring_q, xn)))
    np.testing.assert_array_equal(a, b)
    a = u.to_u64(scaling.div_round_by_last_modulus(ring_q, x))
    b = u.to_u64(ring_q.intt(scaling.div_round_by_last_modulus_ntt(ring_q, xn)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("t", [65537, 1 << 16, 256])
def test_simple_scaler_vs_rational(rings, t):
    """round(t/Q * x) mod t, vs exact rational arithmetic
    (ring/ring_test.go:587 SimpleScaling)."""
    ring_q, _ = rings
    rng = random.Random(11)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    sc = scaling.SimpleScaler(t, ring_q)
    got = u.to_u64(sc.scale(x, 1))[0]
    big_q = ring_q.modulus_bigint
    want = np.array(
        [((c * t + big_q // 2) // big_q) % t for c in coeffs], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_galois_permute_coeff_domain(rings):
    """x^i -> x^(gen*i) with sign wrap (ring/ring_test.go:422 GaloisShift)."""
    ring_q, _ = rings
    rng = random.Random(12)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    gen = 5
    got = ring_q.poly_to_bigint(galois.permute(ring_q, x, gen))
    want = [0] * N
    for i in range(N):
        idx = (i * gen) % (2 * N)
        if idx >= N:
            want[idx - N] = (-coeffs[i]) % ring_q.modulus_bigint
        else:
            want[idx] = coeffs[i]
    assert got == want


def test_permute_ntt_matches_coeff_permute(rings):
    ring_q, _ = rings
    rng = random.Random(13)
    coeffs = rand_bigints(rng, ring_q.modulus_bigint, N)
    x = ring_q.set_coeffs_bigint(coeffs)
    gal_el = pow(5, 3, 2 * N)
    a = u.to_u64(ring_q.ntt(galois.permute(ring_q, x, gal_el)))
    b = u.to_u64(galois.permute_ntt(ring_q.ntt(x), gal_el))
    np.testing.assert_array_equal(a, b)


def test_uniform_sampler(rings):
    ring_q, _ = rings
    key = jax.random.key(0)
    x = u.to_u64(samplers.uniform_poly(key, ring_q))
    for i, q in enumerate(Q_MODULI):
        assert (x[i] < q).all()
    assert len(np.unique(x)) > N  # not degenerate


def test_gaussian_sampler(rings):
    ring_q, _ = rings
    big = Ring(2048, nt.generate_ntt_primes(55, 11, 1))
    x = u.to_u64(samplers.gaussian_poly(jax.random.key(1), big))[0]
    q = big.moduli[0]
    signed = np.where(x > q // 2, x.astype(np.int64) - q, x.astype(np.int64))
    assert (np.abs(signed) < 19).all()
    std = signed.std()
    assert 2.6 < std < 3.8, std  # sigma = 3.2
    assert abs(signed.mean()) < 0.5


def test_ternary_samplers(rings):
    ring_q, _ = rings
    big = Ring(2048, nt.generate_ntt_primes(55, 11, 2))
    x = u.to_u64(samplers.ternary_poly(jax.random.key(2), big, p=0.5))
    q0 = big.moduli[0]
    vals = set(np.unique(x[0]).tolist())
    assert vals <= {0, 1, q0 - 1}
    frac_zero = (x[0] == 0).mean()
    assert 0.4 < frac_zero < 0.6
    # montgomery form maps through mform
    xm = u.to_u64(samplers.ternary_poly(jax.random.key(2), big, p=0.5, montgomery=True))
    assert set(np.unique(xm[0]).tolist()) <= {0, nt.mform(1, q0), nt.mform(q0 - 1, q0)}

    xs = u.to_u64(samplers.ternary_sparse_poly(jax.random.key(3), big, hw=128))
    assert int((xs[0] != 0).sum()) == 128


def test_crp_generator_determinism(rings):
    """Two synchronized generators agree (ring/ring_test.go:67 PRNG test)."""
    ring_q, _ = rings
    g1 = CRPGenerator(b"key", ring_q)
    g2 = CRPGenerator(b"key", ring_q)
    g1.seed(b"seed")
    g2.seed(b"seed")
    g1.set_clock(256)
    g2.set_clock(256)
    p1 = u.to_u64(g1.clock_poly())
    p2 = u.to_u64(g2.clock_poly())
    np.testing.assert_array_equal(p1, p2)
    for i, q in enumerate(Q_MODULI):
        assert (p1[i] < q).all()
    # different clocks diverge
    p3 = u.to_u64(g1.clock_poly())
    assert not (p1 == p3).all()


def test_prng_chain_sync():
    a, b = PRNG(b"k"), PRNG(b"k")
    a.seed(b"s")
    b.seed(b"s")
    a.clock()
    b.set_clock(1)
    assert a.clock() == b.clock()
