"""Every NTT schedule, both directions, at TPU-production sizes.

The golden vectors (ring/test_data, see test_ntt_golden.py) stop at N=512,
below the ``_NTT_FAST_MIN = 4096`` dispatch threshold, so the TPU-shaped
schedules never ran under round-1 CI.  Here each schedule is checked for
bit-exact equality against ``_ntt_simple`` — itself golden-anchored and
structurally the reference transform (ring/ntt.go:53-139) — at N >= 4096,
forward and inverse, on prefix and non-prefix limb sets, including the
production Pallas dispatch path (batch >= 64, interpret mode on CPU).

A bug planted in any one schedule breaks the exact-equality assertions.
"""

import numpy as np
import pytest

from lattigo_tpu.ops import pallas_ntt as pn
from lattigo_tpu.ops import ring as ring_mod
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.ring import Ring

# three golden-style 60-bit NTT primes for N up to 2^14
MODULI = [576460752303439873, 576460752303702017, 576460752304439297]


@pytest.fixture(scope="module")
def rings():
    from lattigo_tpu.ops import number_theory as nt

    cache = {}

    def get(n):
        if n not in cache:
            # the golden 60-bit primes are == 1 mod 2^14 (N <= 8192 only);
            # larger rings use the library's own NTT-prime generator
            mods = MODULI if 2 * n <= 1 << 14 else nt.generate_ntt_primes(59, n.bit_length() - 1, 3)
            cache[n] = Ring(n, mods)
        return cache[n]

    return get


def _sample(ring, limbs, batch=(), seed=3):
    rng = np.random.default_rng(seed)
    q = np.array([ring.moduli[l] for l in limbs], dtype=np.uint64)
    x = rng.integers(0, 1 << 60, size=(*batch, len(limbs), ring.n), dtype=np.uint64)
    return x % q[None if batch else slice(None), :, None] if batch else x % q[:, None]


SCHEDULES = ["fast", "roll", "pallas"]
LIMB_SETS = [(0, 1, 2), (2, 0)]  # prefix and non-prefix


def _run(ring, sched, x, limbs, inverse):
    if sched == "fast":
        fn = ring._intt_fast if inverse else ring._ntt_fast
        return fn(x, limbs)
    if sched == "roll":
        return ring.ntt_roll(x, limbs, inverse=inverse)
    return pn.ntt_pallas_passes(
        ring, x, limbs, inverse=inverse, interpret=True, lanes=8
    )


@pytest.mark.parametrize("limbs", LIMB_SETS, ids=["prefix", "nonprefix"])
@pytest.mark.parametrize("sched", SCHEDULES)
def test_forward_matches_reference_schedule(rings, sched, limbs):
    ring = rings(4096)
    x = _sample(ring, limbs)
    ref = u.to_u64(ring._ntt_simple(u.from_u64(x), limbs))
    got = u.to_u64(_run(ring, sched, u.from_u64(x), limbs, inverse=False))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("limbs", LIMB_SETS, ids=["prefix", "nonprefix"])
@pytest.mark.parametrize("sched", SCHEDULES)
def test_inverse_matches_reference_schedule(rings, sched, limbs):
    ring = rings(4096)
    x = _sample(ring, limbs)
    fwd = ring._ntt_simple(u.from_u64(x), limbs)
    ref = u.to_u64(ring._intt_simple(fwd, limbs))
    got = u.to_u64(_run(ring, sched, fwd, limbs, inverse=True))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize("sched", SCHEDULES)
def test_lazy_input_roundtrip(rings, sched):
    """Dispatch contract: inputs may be lazily reduced (< 4q)."""
    ring = rings(4096)
    limbs = (0, 1)
    x = _sample(ring, limbs)
    lazy = x + np.array(ring.moduli[:2], dtype=np.uint64)[:, None]  # in [q, 2q)
    fwd_ref = u.to_u64(ring._ntt_simple(u.from_u64(lazy), limbs))
    got = u.to_u64(_run(ring, sched, u.from_u64(lazy), limbs, inverse=False))
    np.testing.assert_array_equal(got, fwd_ref)


def test_production_pallas_dispatch_batch64(rings):
    """ring.ntt/intt through the real dispatcher with the production Pallas
    path forced (batch 64 exercises the lane padding of lanes=128)."""
    ring = rings(4096)
    x = _sample(ring, (0, 1, 2), batch=(64,))
    X = u.from_u64(x)
    ref_f = u.to_u64(ring._ntt_simple(X, (0, 1, 2)))
    ring_mod.FORCE_PALLAS = True
    try:
        fwd = ring.ntt(X)
        np.testing.assert_array_equal(u.to_u64(fwd), ref_f)
        inv = ring.intt(fwd)
        np.testing.assert_array_equal(u.to_u64(inv), x)
    finally:
        ring_mod.FORCE_PALLAS = False


@pytest.mark.slow
@pytest.mark.parametrize("n", [8192, 16384])
def test_large_n_all_schedules(rings, n):
    ring = rings(n)
    limbs = (0, 1)
    x = _sample(ring, limbs)
    X = u.from_u64(x)
    ref = u.to_u64(ring._ntt_simple(X, limbs))
    for sched in SCHEDULES:
        got = _run(ring, sched, X, limbs, inverse=False)
        np.testing.assert_array_equal(u.to_u64(got), ref)
        back = _run(ring, sched, got, limbs, inverse=True)
        np.testing.assert_array_equal(u.to_u64(back), x)
