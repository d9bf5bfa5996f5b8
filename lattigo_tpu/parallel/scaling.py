"""Multi-chip scaling harness: batched CKKS ciphertext multiplication
sharded over the mesh ``data`` axis (BASELINE.json's weak-scaling metric).

Homomorphic evaluation over independent ciphertexts is embarrassingly
parallel (the reference fans it out to goroutines,
examples/dbfv/pir/pir.go:293-331); on TPU the batch axis shards over devices
and each shard runs the identical fused mul+relinearize program.  Keys and
twiddle tables replicate.  Scaling efficiency is then
  eff(n) = throughput(n devices) / (n * throughput(1 device)).
"""

from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lattigo_tpu.models import ckks
from lattigo_tpu.parallel.mesh import make_mesh


def build_mul_step(params, rlk):
    """Jittable batched ct-ct multiply + relinearize: takes stacked degree-1
    ciphertext pairs [B, ...] and returns the relinearized product batch."""
    ev = ckks.Evaluator(params)

    def step(a0, a1, b0, b1, scale_a: float, scale_b: float):
        ct_a = ckks.Ciphertext([a0, a1], scale_a)
        ct_b = ckks.Ciphertext([b0, b1], scale_b)
        out = ev.mul_relin(ct_a, ct_b, rlk)
        return out.value[0], out.value[1]

    return step


def make_ct_batch(params, encryptor, encoder, batch: int, rng):
    """Batch of fresh degree-1 ciphertexts stacked on a leading axis."""
    import jax.numpy as jnp

    cts = []
    for _ in range(batch):
        v = rng.uniform(-1, 1, params.slots).astype(np.complex128)
        cts.append(encryptor.encrypt(encoder.encode(v)))
    stack = lambda polys: (
        jnp.stack([p[0] for p in polys]),
        jnp.stack([p[1] for p in polys]),
    )
    c0 = stack([ct.value[0] for ct in cts])
    c1 = stack([ct.value[1] for ct in cts])
    return c0, c1, cts[0].scale


def weak_scaling_mul(params, n_devices: int, batch_per_device: int = 4, iters: int = 10, rng_seed: int = 0):
    """Measure batched CKKS ct-ct mult throughput on 1..n_devices.

    Returns {n: ciphertext_mults_per_second}.  On a single-chip host with
    virtual CPU devices this validates the sharded program; true ICI scaling
    numbers require a real multi-chip slice.
    """
    kgen = ckks.KeyGenerator(params)
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, pk=pk)
    rng = np.random.default_rng(rng_seed)
    step = build_mul_step(params, rlk)

    results = {}
    for n in sorted({1, n_devices}):
        mesh = make_mesh(n, party=1)
        B = batch_per_device * n
        a0, a1, scale = make_ct_batch(params, encryptor, enc, B, rng)
        b0, b1, _ = make_ct_batch(params, encryptor, enc, B, rng)
        shard = NamedSharding(mesh, P("data"))
        put = lambda t: (
            jax.device_put(t[0], shard),
            jax.device_put(t[1], shard),
        )
        a0, a1, b0, b1 = put(a0), put(a1), put(b0), put(b1)

        f = jax.jit(lambda x0, x1, y0, y1: step(x0, x1, y0, y1, scale, scale))
        out = f(a0, a1, b0, b1)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(a0, a1, b0, b1)
        jax.block_until_ready(out)
        dt = time.time() - t0
        results[n] = B * iters / dt
    return results
