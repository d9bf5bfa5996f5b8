"""MXU four-step NTT: bit-exactness vs the reference schedule.

The kernel (ops/mxu_ntt.py) evaluates the transform of ring/ntt.go:53-139
as two exact int8 digit matmuls; these tests pin it (interpret mode on
CPU) against the golden-anchored ``_ntt_simple`` stage loop, through the
same dispatcher gate the TPU uses (FORCE_MXU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattigo_tpu.ops import mxu_ntt, number_theory as nt
from lattigo_tpu.ops import ring as ring_mod
from lattigo_tpu.ops import u64 as u


def _ring(n, n_limbs=2):
    qs = nt.generate_ntt_primes(60, n.bit_length() - 1, n_limbs)
    return ring_mod.Ring(n, qs)


def _rand(ring, batch, rng):
    q = np.array(ring.moduli, dtype=np.uint64)
    x = rng.integers(0, 1 << 60, size=(*batch, len(ring.moduli), ring.n),
                     dtype=np.uint64)
    return x % q[None, :, None]


def _ref(ring, x, limbs, inverse=False):
    fn = ring._intt_simple if inverse else ring._ntt_simple
    return u.to_u64(jax.jit(lambda a: fn(a, limbs))(u.from_u64(x)))


def test_supported():
    assert not mxu_ntt.supported(2048)
    assert mxu_ntt.supported(4096)
    assert mxu_ntt.supported(8192)
    assert mxu_ntt.supported(32768)
    assert not mxu_ntt.supported(65536)
    assert not mxu_ntt.supported(12288)


@pytest.mark.parametrize("n,batch", [(4096, (5,)), (8192, (4,))])
def test_forward_bit_exact(n, batch):
    ring = _ring(n)
    rng = np.random.default_rng(7)
    x = _rand(ring, batch, rng)
    y = mxu_ntt.ntt_mxu(ring, u.from_u64(x), (0, 1), interpret=True,
                        block_polys=4)
    assert (u.to_u64(jax.tree.map(np.asarray, y)) == _ref(ring, x, (0, 1))).all()


def test_inverse_roundtrip():
    ring = _ring(4096)
    rng = np.random.default_rng(8)
    x = _rand(ring, (3,), rng)
    y = mxu_ntt.ntt_mxu(ring, u.from_u64(x), (0, 1), interpret=True,
                        block_polys=3)
    z = mxu_ntt.ntt_mxu(ring, jax.tree.map(jnp.asarray, y), (0, 1),
                        inverse=True, interpret=True, block_polys=3)
    assert (u.to_u64(jax.tree.map(np.asarray, z)) == x).all()


def test_inverse_matches_reference_schedule():
    ring = _ring(4096)
    rng = np.random.default_rng(9)
    x = _rand(ring, (2,), rng)
    z = mxu_ntt.ntt_mxu(ring, u.from_u64(x), (0, 1), inverse=True,
                        interpret=True, block_polys=2)
    assert (u.to_u64(jax.tree.map(np.asarray, z))
            == _ref(ring, x, (0, 1), inverse=True)).all()


def test_lazy_inputs_accepted():
    """Inputs below 2^62 (lazily reduced) produce the exact reduced output."""
    ring = _ring(4096)
    rng = np.random.default_rng(10)
    x = _rand(ring, (2,), rng)
    q = np.array(ring.moduli, dtype=np.uint64)[None, :, None]
    lazy = x + 3 * q  # < 2^62
    y = mxu_ntt.ntt_mxu(ring, u.from_u64(lazy), (0, 1), interpret=True,
                        block_polys=2)
    assert (u.to_u64(jax.tree.map(np.asarray, y)) == _ref(ring, x, (0, 1))).all()


def test_limb_subset():
    ring = _ring(4096, n_limbs=3)
    rng = np.random.default_rng(11)
    x = _rand(ring, (2,), rng)
    sub = x[:, (2, 0), :]
    y = mxu_ntt.ntt_mxu(ring, u.from_u64(sub), (2, 0), interpret=True,
                        block_polys=2)
    ref = _ref(ring, sub, (2, 0))
    assert (u.to_u64(jax.tree.map(np.asarray, y)) == ref).all()


def test_dispatcher_routes_mxu(monkeypatch):
    """With FORCE_MXU, Ring.ntt at batch >= threshold runs the MXU kernel
    (asserted by poisoning the other kernels) and stays bit-exact."""
    ring = _ring(4096)
    rng = np.random.default_rng(12)
    x = _rand(ring, (4,), rng)
    monkeypatch.setattr(ring_mod, "FORCE_MXU", True)

    from lattigo_tpu.ops import pallas_ntt, tile_ntt

    def _boom(*a, **k):
        raise AssertionError("dispatcher did not pick the MXU kernel")

    monkeypatch.setattr(pallas_ntt, "ntt_pallas_passes", _boom)
    monkeypatch.setattr(tile_ntt, "ntt_tile", _boom)
    y = ring.ntt(u.from_u64(x))
    assert (u.to_u64(jax.tree.map(np.asarray, y)) == _ref(ring, x, (0, 1))).all()
    z = ring.intt(jax.tree.map(jnp.asarray, y))
    assert (u.to_u64(jax.tree.map(np.asarray, z)) == x).all()


def test_dispatcher_small_batch_stays_tile(monkeypatch):
    """Below the crossover batch (single poly) the tile kernel still serves."""
    ring = _ring(4096)
    rng = np.random.default_rng(13)
    x = _rand(ring, (), rng)
    monkeypatch.setattr(ring_mod, "FORCE_MXU", True)
    called = {}

    from lattigo_tpu.ops import tile_ntt

    real = tile_ntt.ntt_tile

    def _spy(*a, **k):
        called["tile"] = True
        return real(*a, **k)

    monkeypatch.setattr(tile_ntt, "ntt_tile", _spy)
    monkeypatch.setattr(ring_mod, "FORCE_TILE", True)
    y = ring.ntt(u.from_u64(x))
    assert called.get("tile")
    assert (u.to_u64(jax.tree.map(np.asarray, y)) == _ref(ring, x, (0, 1))).all()
