"""Four-step cross-chip NTT: bit-exact vs the single-device transform on the
8-device virtual mesh — limb sweep, batches, limb subsets, mesh-split
factors, and the scheme-level ``sharded_ntt`` dispatch path up to a full
BFV multiply at N=2^14 (VERDICT r4 items 4 and 9; reference battery
anchor: ring/ntt_test.go:101-142)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lattigo_tpu.ops import number_theory as nt
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.parallel.cross_ntt import ntt_four_step, sharded_ntt
from lattigo_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, party=1)  # all 8 devices on the 'data' axis


def _ring(log_n, n_limbs, bits=59):
    n = 1 << log_n
    if log_n <= 13 and n_limbs == 2:
        return Ring(n, [576460752303439873, 576460752303702017])
    return Ring(n, nt.generate_ntt_primes(bits, log_n, n_limbs))


def _rand(ring, batch, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 1 << 60, size=(*batch, ring.L, ring.n), dtype=np.uint64)
    return x % np.array(ring.moduli, dtype=np.uint64)[:, None]


@pytest.mark.parametrize("log_n", [12, 16])
def test_four_step_forward_inverse_bitexact(mesh, log_n):
    ring = _ring(log_n, 2)
    x = _rand(ring, (), 5)
    X = u.from_u64(x)

    want = u.to_u64(ring.ntt(X))
    got = u.to_u64(ntt_four_step(ring, X, mesh, axis="data"))
    np.testing.assert_array_equal(got, want)

    back = ntt_four_step(ring, u.from_u64(got), mesh, axis="data", inverse=True)
    np.testing.assert_array_equal(u.to_u64(back), x)


@pytest.mark.parametrize("n_limbs", [1, 3, 4])
def test_limb_sweep(mesh, n_limbs):
    ring = _ring(12, n_limbs)
    x = _rand(ring, (), 6)
    got = u.to_u64(ntt_four_step(ring, u.from_u64(x), mesh, axis="data"))
    np.testing.assert_array_equal(got, u.to_u64(ring.ntt(u.from_u64(x))))


def test_batched_and_limb_subset(mesh):
    ring = _ring(12, 3)
    x = _rand(ring, (3,), 7)
    sub = x[:, (2, 0), :]
    got = ntt_four_step(ring, u.from_u64(sub), mesh, axis="data",
                        limbs=(2, 0))
    want = ring.ntt_limbs(u.from_u64(sub), (2, 0))
    np.testing.assert_array_equal(u.to_u64(got), u.to_u64(want))
    back = ntt_four_step(ring, got, mesh, axis="data", limbs=(2, 0),
                         inverse=True)
    np.testing.assert_array_equal(u.to_u64(back), sub)


@pytest.mark.parametrize("party,n2", [(2, None), (4, None), (1, 256), (2, 512)])
def test_mesh_split_factors(party, n2):
    """Non-default data-axis sizes (8/party) and n2 overrides."""
    m = make_mesh(8, party=party)
    ring = _ring(13, 2)
    x = _rand(ring, (), 8)
    got = ntt_four_step(ring, u.from_u64(x), m, axis="data", n2=n2)
    np.testing.assert_array_equal(u.to_u64(got), u.to_u64(ring.ntt(u.from_u64(x))))


def test_sharded_ring_dispatch(mesh):
    """Inside sharded_ntt(), Ring.ntt/intt route through the four-step path
    (including ModDown-style limb subsets) with identical outputs."""
    ring = _ring(14, 2)
    x = _rand(ring, (2,), 9)
    want_f = u.to_u64(ring.ntt(u.from_u64(x)))
    with sharded_ntt(mesh, axis="data", min_n=1 << 14):
        got_f = ring.ntt(u.from_u64(x))
        np.testing.assert_array_equal(u.to_u64(got_f), want_f)
        back = ring.intt(got_f)
        np.testing.assert_array_equal(u.to_u64(back), x)
        sub = ring.ntt_limbs(u.from_u64(x[:, (1,), :]), (1,))
    np.testing.assert_array_equal(
        u.to_u64(sub), u.to_u64(ring.ntt_limbs(u.from_u64(x[:, (1,), :]), (1,))))


def test_bfv_mul_end_to_end_sharded(mesh):
    """A full BFV encrypt -> mul+relin -> decrypt at N=2^14 with EVERY NTT
    routed over the 8-device mesh, exact vs the plaintext product
    (bfv/evaluator.go:278-464 through parallel/cross_ntt.py)."""
    from lattigo_tpu.models import bfv

    params = bfv.Parameters(
        log_n=14,
        t=65537,
        log_qi=(54, 55),
        log_pi=(55,),
        # tensoring needs Q*QMul > 4*N*Q^2 (ring/ring_basis_extension.go
        # headroom): 3x60 bits > 109 + 14 + 2
        log_qi_mul=(60, 60, 60),
    ).gen_from_log_moduli()
    kg = bfv.KeyGenerator(params)
    sk, pk = kg.gen_key_pair()
    rlk = kg.gen_relin_key(sk)
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    dec = bfv.Decryptor(params, sk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(10)
    a = rng.integers(0, params.t, params.n, dtype=np.uint64)
    b = rng.integers(0, params.t, params.n, dtype=np.uint64)

    with sharded_ntt(mesh, axis="data", min_n=1 << 14):
        ca = encryptor.encrypt(enc.encode_uint(a))
        cb = encryptor.encrypt(enc.encode_uint(b))
        cm = ev.relinearize(ev.mul(ca, cb), rlk)
        got = enc.decode_uint(dec.decrypt(cm))

    want = (a.astype(object) * b.astype(object)) % params.t
    np.testing.assert_array_equal(got.astype(object), want)
