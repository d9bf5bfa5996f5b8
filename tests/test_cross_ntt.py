"""Four-step cross-chip NTT: bit-exact vs the single-device transform on the
8-device virtual mesh, forward and inverse (VERDICT round-1 item 6)."""

import numpy as np
import pytest

from lattigo_tpu.ops import number_theory as nt
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.parallel.cross_ntt import ntt_four_step
from lattigo_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, party=1)  # all 8 devices on the 'data' axis


@pytest.mark.parametrize("log_n", [12, 16])
def test_four_step_forward_inverse_bitexact(mesh, log_n):
    n = 1 << log_n
    moduli = (
        [576460752303439873, 576460752303702017]
        if log_n <= 13
        else nt.generate_ntt_primes(59, log_n, 2)
    )
    ring = Ring(n, moduli)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1 << 60, size=(2, n), dtype=np.uint64)
    x %= np.array(moduli, dtype=np.uint64)[:, None]
    X = u.from_u64(x)

    want = u.to_u64(ring.ntt(X))
    got = u.to_u64(ntt_four_step(ring, X, mesh, axis="data"))
    np.testing.assert_array_equal(got, want)

    back = ntt_four_step(ring, u.from_u64(got), mesh, axis="data", inverse=True)
    np.testing.assert_array_equal(u.to_u64(back), x)
