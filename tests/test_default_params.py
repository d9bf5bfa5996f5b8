"""End-to-end scheme tests on the reference's default parameter sets.

Round-1 CI only exercised toy parameters (log_n=7-8, 2-4 limbs); here the
published 128-bit-secure sets run the full encrypt -> mul -> relin -> rotate
-> decrypt pipeline, making ``default_params()`` load-bearing and covering
alpha >= 2 and uneven-beta Decomposer paths (ops/basis_ext.py:222-236).
Anchors: bfv/bfv_test.go:268-302 (exact), ckks/ckks_test.go:60 (precision).

Marked slow (RUN_SLOW=1): a full BFV multiply at N=2^13+ takes tens of
seconds on the CPU backend.
"""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import bfv, ckks
from lattigo_tpu.utils.precision import precision_stats

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("idx", [bfv.PN12QP109, bfv.PN13QP218],
                         ids=["PN12QP109", "PN13QP218"])
def test_bfv_default_params_exact(idx):
    params = bfv.default_params(idx)
    kgen = bfv.KeyGenerator(params, rng_key=jax.random.key(7))
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    rot = kgen.gen_rotation_keys_pow2(sk)
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    dec = bfv.Decryptor(params, sk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(idx)
    t = np.uint64(params.t)
    a = rng.integers(0, params.t, params.n, dtype=np.uint64)
    b = rng.integers(0, params.t, params.n, dtype=np.uint64)

    ct_a = encryptor.encrypt(enc.encode_uint(a))
    ct_b = encryptor.encrypt(enc.encode_uint(b))

    # add, mul+relin: exact equality with plaintext arithmetic mod t
    got_add = enc.decode_uint(dec.decrypt(ev.add(ct_a, ct_b)))
    np.testing.assert_array_equal(got_add, (a + b) % t)

    prod = ev.relinearize(ev.mul(ct_a, ct_b), rlk)
    got_mul = enc.decode_uint(dec.decrypt(prod))
    np.testing.assert_array_equal(got_mul, (a * b) % t)

    # rotation of the product (keyswitch at alpha/beta of the default set)
    rot1 = ev.rotate_columns(prod, 1, rot)
    got_rot = enc.decode_uint(dec.decrypt(rot1))
    half = params.n // 2
    want = (a * b) % t
    want = np.concatenate([np.roll(want[:half], -1), np.roll(want[half:], -1)])
    np.testing.assert_array_equal(got_rot, want)


@pytest.mark.parametrize("idx", [ckks.PN12QP109, ckks.PN14QP438],
                         ids=["PN12QP109", "PN14QP438"])
def test_ckks_default_params_precision(idx):
    params = ckks.default_params(idx)
    kgen = ckks.KeyGenerator(params, rng_key=jax.random.key(8))
    sk, pk = kgen.gen_key_pair_sparse(hw=128)
    rlk = kgen.gen_relin_key(sk)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, pk=pk)
    dec = ckks.Decryptor(params, sk)
    ev = ckks.Evaluator(params)

    rng = np.random.default_rng(idx)
    v0 = (rng.uniform(-1, 1, params.slots) + 1j * rng.uniform(-1, 1, params.slots))
    v1 = (rng.uniform(-1, 1, params.slots) + 1j * rng.uniform(-1, 1, params.slots))

    ct0 = encryptor.encrypt(enc.encode(v0))
    ct1 = encryptor.encrypt(enc.encode(v1))

    # encoder roundtrip precision (ckks_test.go asserts >= ~13 bits median)
    stats = precision_stats(enc.decode(dec.decrypt(ct0)), v0)
    assert stats.median_bits >= 13, stats

    # mul + relin + rescale
    prod = ev.rescale(ev.mul_relin(ct0, ct1, rlk))
    stats = precision_stats(enc.decode(dec.decrypt(prod)), v0 * v1)
    assert stats.median_bits >= 12, stats

    if prod.level >= 1:
        # second multiply at the dropped level: exercises the uneven-beta /
        # reduced-level Decomposer path of the default set's keyswitch
        sq = ev.rescale(ev.mul_relin(prod, prod, rlk))
        stats = precision_stats(enc.decode(dec.decrypt(sq)), (v0 * v1) ** 2)
        assert stats.median_bits >= 10, stats
