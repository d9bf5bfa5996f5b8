"""Coverage of the reference default parameter sets: keygen -> sk-encrypt
-> add -> decrypt -> decode on BFV PN12-PN14 and CKKS PN12-PN14 un-gated
(PN14 = N=2^14 is the always-on large-N representative); the PN15/PN16
sets run under RUN_SLOW=1 to keep the default suite bounded (VERDICT r03
item 4).  The deep mul/relin/rotate pipelines on these sets stay in
test_default_params.py under RUN_SLOW=1.

Anchors: bfv/params.go:47-88, ckks/params.go:35-87,
bfv/bfv_test.go:268-302 (exact), ckks/ckks_test.go:60 (precision).
"""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import bfv, ckks
from lattigo_tpu.utils.precision import precision_stats


@pytest.mark.parametrize(
    "idx",
    [bfv.PN12QP109, bfv.PN13QP218, bfv.PN14QP438,
     pytest.param(bfv.PN15QP880, marks=pytest.mark.slow)],
    ids=["PN12QP109", "PN13QP218", "PN14QP438", "PN15QP880"],
)
def test_bfv_default_set_encrypt_add_exact(idx):
    params = bfv.default_params(idx)
    kgen = bfv.KeyGenerator(params, rng_key=jax.random.key(17))
    sk = kgen.gen_secret_key()
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, sk=sk)
    dec = bfv.Decryptor(params, sk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(idx)
    t = np.uint64(params.t)
    a = rng.integers(0, params.t, params.n, dtype=np.uint64)
    b = rng.integers(0, params.t, params.n, dtype=np.uint64)
    ct_a = encryptor.encrypt(enc.encode_uint(a))
    ct_b = encryptor.encrypt(enc.encode_uint(b))

    got = enc.decode_uint(dec.decrypt(ev.add(ct_a, ct_b)))
    np.testing.assert_array_equal(got, (a + b) % t)


@pytest.mark.parametrize(
    "idx",
    [ckks.PN12QP109, ckks.PN13QP218, ckks.PN14QP438,
     pytest.param(ckks.PN15QP880, marks=pytest.mark.slow),
     pytest.param(ckks.PN16QP1761, marks=pytest.mark.slow)],
    ids=["PN12QP109", "PN13QP218", "PN14QP438", "PN15QP880", "PN16QP1761"],
)
def test_ckks_default_set_encrypt_add_precision(idx):
    params = ckks.default_params(idx)
    kgen = ckks.KeyGenerator(params, rng_key=jax.random.key(18))
    sk = kgen.gen_secret_key_sparse(hw=128)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, sk=sk)
    dec = ckks.Decryptor(params, sk)
    ev = ckks.Evaluator(params)

    rng = np.random.default_rng(idx)
    v0 = rng.uniform(-1, 1, params.slots) + 1j * rng.uniform(-1, 1, params.slots)
    v1 = rng.uniform(-1, 1, params.slots) + 1j * rng.uniform(-1, 1, params.slots)
    ct0 = encryptor.encrypt(enc.encode(v0))
    ct1 = encryptor.encrypt(enc.encode(v1))

    stats = precision_stats(enc.decode(dec.decrypt(ev.add(ct0, ct1))), v0 + v1)
    assert stats.median_bits >= 13, stats
