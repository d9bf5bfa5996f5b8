"""CRP stream: vectorized walk == scalar reference walk, byte for byte.

The vectorized ``clock_poly`` (C walk / NumPy fallback + speculative digest
commit) must reproduce the literal ring/prng.go:77-103 loop exactly —
values, clock advancement, and the continuation of the stream across calls.
"""

import numpy as np

from lattigo_tpu.ops.number_theory import generate_ntt_primes
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.utils import prng as prng_mod
from lattigo_tpu.utils.prng import CRPGenerator


def _rings():
    # one modulus just BELOW and one just ABOVE a power of two: low and
    # ~50% rejection rates, both walk regimes
    n = 256
    mods = generate_ntt_primes(59, 8, 2) + generate_ntt_primes(60, 8, 1)
    return Ring(n, mods, compute_ntt_tables=False)


def test_vectorized_matches_scalar_across_calls():
    ring = _rings()
    a = CRPGenerator(b"key", ring)
    b = CRPGenerator(b"key", ring)
    a.seed(b"seed")
    b.seed(b"seed")
    for _ in range(3):
        va = u.to_u64(a.clock_poly())
        vb = u.to_u64(b.clock_poly_scalar())
        np.testing.assert_array_equal(va, vb)
        assert a.get_clock() == b.get_clock()


def test_numpy_fallback_matches_c():
    ring = _rings()
    masks = np.array(ring.mask, dtype=np.uint64)
    qs = np.array(ring.moduli, dtype=np.uint64)
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 63, size=4096, dtype=np.uint64) * 2 + rng.integers(0, 2, 4096).astype(np.uint64)
    out_np = np.zeros((ring.L, ring.n), dtype=np.uint64)
    k_np = prng_mod._walk_numpy(words, masks, qs, ring.L, ring.n, out_np)
    from lattigo_tpu import native

    if native.crp_walk_lib() is None:
        return  # no toolchain: fallback is the implementation under test above
    out_c = np.zeros((ring.L, ring.n), dtype=np.uint64)
    k_c = prng_mod._walk(words, masks, qs, ring.L, ring.n, out_c)
    assert k_np == k_c
    np.testing.assert_array_equal(out_np, out_c)


def test_walk_grows_on_exhaustion():
    """A stream too short must signal -1 (both paths), and clock_poly must
    transparently grow the speculative buffer."""
    ring = _rings()
    masks = np.array(ring.mask, dtype=np.uint64)
    qs = np.array(ring.moduli, dtype=np.uint64)
    words = np.zeros(10, dtype=np.uint64)  # all-accept but far too short
    out = np.zeros((ring.L, ring.n), dtype=np.uint64)
    assert prng_mod._walk_numpy(words, masks, qs, ring.L, ring.n, out) == -1
    assert prng_mod._walk(words, masks, qs, ring.L, ring.n, out) == -1
