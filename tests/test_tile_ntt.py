"""Tile NTT kernel: bit-exactness vs the reference schedule (interpret
mode), including the factorized lane-stage twiddles, batches, inverse
roundtrips, and golden vectors."""

import numpy as np
import pytest

from lattigo_tpu.ops import ring as ring_mod
from lattigo_tpu.ops import tile_ntt
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.default_params import default_qi


def _ring(log_n, limbs=2):
    return ring_mod.Ring(1 << log_n, list(default_qi(log_n, limbs)))


def _rand(ring, batch=(), seed=0, lazy=False):
    # lazy = the reference's valid lazily-reduced input domain [0, 2q)
    rng = np.random.default_rng(seed)
    hi = 2 if lazy else 1
    x = np.empty((*batch, ring.L, ring.n), dtype=np.uint64)
    for i, q in enumerate(ring.moduli):
        x[..., i, :] = rng.integers(0, hi * q, size=(*batch, ring.n), dtype=np.uint64)
    return x


@pytest.mark.parametrize("log_n", [12, 13])
def test_tile_fwd_matches_simple(log_n):
    ring = _ring(log_n)
    x = _rand(ring, seed=1)
    xs = u.from_u64(x)
    limbs = (0, 1)
    ref = u.to_u64(ring._ntt_simple(xs, limbs))
    out = u.to_u64(tile_ntt.ntt_tile(ring, xs, limbs, interpret=True))
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("log_n", [12, 13])
def test_tile_inv_roundtrip(log_n):
    ring = _ring(log_n)
    x = _rand(ring, seed=2)
    xs = u.from_u64(x)
    limbs = (0, 1)
    fwd = tile_ntt.ntt_tile(ring, xs, limbs, interpret=True)
    back = u.to_u64(
        tile_ntt.ntt_tile(ring, fwd, limbs, inverse=True, interpret=True)
    )
    np.testing.assert_array_equal(back, x)


def test_tile_inv_matches_simple():
    ring = _ring(12)
    x = _rand(ring, seed=3)
    xs = u.from_u64(x)
    limbs = (0, 1)
    ref = u.to_u64(ring._intt_simple(xs, limbs))
    out = u.to_u64(
        tile_ntt.ntt_tile(ring, xs, limbs, inverse=True, interpret=True)
    )
    np.testing.assert_array_equal(ref, out)


def test_tile_batched_and_lazy_input():
    """Batch > 1 (limb-major row transpose) with lazily reduced (< 4q)
    inputs, both directions, vs the golden-anchored simple schedule."""
    ring = _ring(12)
    x = _rand(ring, batch=(3,), seed=4, lazy=True)
    xs = u.from_u64(x)
    limbs = (0, 1)
    ref = u.to_u64(ring._ntt_simple(xs, limbs))
    out = u.to_u64(tile_ntt.ntt_tile(ring, xs, limbs, interpret=True))
    np.testing.assert_array_equal(ref, out)
    ref_b = u.to_u64(ring._intt_simple(xs, limbs))
    back = u.to_u64(
        tile_ntt.ntt_tile(ring, xs, limbs, inverse=True, interpret=True)
    )
    np.testing.assert_array_equal(ref_b, back)


def test_tile_nonprefix_limbs():
    """Stacked key-switch planes address non-prefix limb tables."""
    ring = _ring(12, limbs=3)
    x = _rand(ring, seed=5)[1:]  # rows under moduli 1, 2
    xs = u.from_u64(x)
    limbs = (1, 2)
    ref = u.to_u64(ring._ntt_simple(xs, limbs))
    out = u.to_u64(tile_ntt.ntt_tile(ring, xs, limbs, interpret=True))
    np.testing.assert_array_equal(ref, out)
