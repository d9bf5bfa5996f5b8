"""Mesh-parallel tests on the virtual 8-device CPU mesh: sharded batched
CKKS multiplication and the CKG protocol over a party axis."""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import bfv, ckks, dbfv
from lattigo_tpu.parallel import mesh as pmesh
from lattigo_tpu.parallel.protocols import collective_keygen_mesh
from lattigo_tpu.parallel.scaling import (
    build_mul_step,
    make_ct_batch,
    weak_scaling_mul,
)

CP = ckks.Parameters(
    log_n=7,
    log_slots=6,
    scale=float(1 << 30),
    log_qi=(40, 30),
    log_pi=(40,),
).gen_from_log_moduli()


def test_sharded_batched_mul_matches_and_decrypts():
    kgen = ckks.KeyGenerator(CP)
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    enc = ckks.Encoder(CP)
    encryptor = ckks.Encryptor(CP, pk=pk)
    dec = ckks.Decryptor(CP, sk)
    rng = np.random.default_rng(0)

    n_dev = min(4, len(jax.devices()))
    mesh = pmesh.make_mesh(n_dev, party=1)
    B = 2 * n_dev
    a0, a1, scale = make_ct_batch(CP, encryptor, enc, B, rng)
    b0, b1, _ = make_ct_batch(CP, encryptor, enc, B, rng)

    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    put = lambda t: (jax.device_put(t[0], shard), jax.device_put(t[1], shard))
    step = build_mul_step(CP, rlk)
    f = jax.jit(lambda x0, x1, y0, y1: step(x0, x1, y0, y1, scale, scale))
    o0, o1 = f(put(a0), put(a1), put(b0), put(b1))

    # decrypt one element of the sharded result and check it is a product
    ct = ckks.Ciphertext(
        [
            (np.asarray(o0[0][0]), np.asarray(o0[1][0])),
            (np.asarray(o1[0][0]), np.asarray(o1[1][0])),
        ],
        scale * scale,
    )
    got = enc.decode(dec.decrypt(ct))
    # reconstruct inputs 0
    ct_a = ckks.Ciphertext(
        [
            (np.asarray(a0[0][0]), np.asarray(a0[1][0])),
            (np.asarray(a1[0][0]), np.asarray(a1[1][0])),
        ],
        scale,
    )
    ct_b = ckks.Ciphertext(
        [
            (np.asarray(b0[0][0]), np.asarray(b0[1][0])),
            (np.asarray(b1[0][0]), np.asarray(b1[1][0])),
        ],
        scale,
    )
    va = enc.decode(dec.decrypt(ct_a))
    vb = enc.decode(dec.decrypt(ct_b))
    err = np.abs(got - va * vb)
    assert np.median(err) < 1e-3


def test_weak_scaling_harness_runs():
    res = weak_scaling_mul(CP, n_devices=min(4, len(jax.devices())), batch_per_device=1, iters=2)
    assert 1 in res and all(v > 0 for v in res.values())


def test_ckg_over_party_mesh_matches_sequential():
    BP = bfv.Parameters(
        log_n=7, t=65537, log_qi=(46,), log_pi=(47,), log_qi_mul=(60,)
    ).gen_from_log_moduli()
    ctx = bfv.get_context(BP)
    mesh = pmesh.make_mesh(4, party=4)
    n_party = 4

    kgens = [
        bfv.KeyGenerator(BP, rng_key=jax.random.key(i)) for i in range(n_party)
    ]
    sks = [kg.gen_secret_key().sk for kg in kgens]

    from lattigo_tpu.ops import samplers

    crp = samplers.uniform_poly(jax.random.key(99), ctx.ring_qp)

    ckg = dbfv.CKGProtocol(BP, rng_key=jax.random.key(1234))
    agg_mesh = collective_keygen_mesh(ckg, sks, crp, mesh)

    # sequential reference with the same noise streams
    ckg2 = dbfv.CKGProtocol(BP, rng_key=jax.random.key(1234))
    ring = ctx.ring_qp
    shares = []
    for p in range(n_party):
        e = ring.ntt(
            samplers.gaussian_poly(
                jax.random.fold_in(ckg2._next_key(), p), ring, BP.sigma
            )
        )
        shares.append(ring.mul_coeffs_montgomery_and_sub(sks[p], crp, e))
    acc = shares[0]
    for s in shares[1:]:
        acc = ring.add(acc, s)

    np.testing.assert_array_equal(np.asarray(agg_mesh[0]), np.asarray(acc[0]))
    np.testing.assert_array_equal(np.asarray(agg_mesh[1]), np.asarray(acc[1]))
