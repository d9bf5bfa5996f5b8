"""Honest (digest-forced, chained) benchmark of the MXU four-step NTT vs
the production pass-split butterfly kernel, at the headline shape.

Round-4's lab11 numbers were measured with block_until_ready on repeated
buffers — cache-tainted under the axon runtime (PERF_NOTES).  This lab
re-measures under the bench.py discipline: in-jit fori chains feeding
outputs into inputs, one digest readback per call.

Usage: python perf_lab/lab12_mxu_honest.py [modes...]
Modes: prod mxu8 mxu16 mxu32 (default: all)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench  # digest_time + compile cache setup
from lattigo_tpu import tjit as T
from lattigo_tpu.ops import mxu_ntt, number_theory as nt
from lattigo_tpu.ops import ring as ring_mod
from lattigo_tpu.ops import u64 as u

import os
cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

N = 8192
L = 2
B = int(os.environ.get("LAB_B", "256"))
MODULI = [576460752303439873, 576460752303702017]  # golden-vector pair
ring = ring_mod.Ring(N, MODULI)

rng = np.random.default_rng(11)
x = rng.integers(0, MODULI[0], size=(B, L, N), dtype=np.uint64)
x %= np.array(MODULI, dtype=np.uint64)[None, :, None]
X = u.from_u64(x)
X = (jax.device_put(X[0]), jax.device_put(X[1]))

modes = sys.argv[1:] or ["check", "prod", "mxu8", "mxu16", "mxu32"]

CHAIN = int(os.environ.get("LAB_CHAIN", "20"))
CALLS = int(os.environ.get("LAB_CALLS", "4"))


def report(label, per_call):
    rate = B * L / per_call
    print(f"{label:10s}: {per_call*1e6:9.1f} us/call  {rate/1e3:8.1f}k NTT/s",
          flush=True)


if "check" in modes:
    # device bit-exactness of the MXU path vs the reference schedule (host)
    f = T.tjit(lambda a: mxu_ntt.ntt_mxu(ring, a, (0, 1)))
    y = f((jax.jit(lambda a: a[:8])(X[0]), jax.jit(lambda a: a[:8])(X[1])))
    y_np = u.to_u64((np.asarray(y[0]), np.asarray(y[1])))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(
            u.from_u64(x[:8])))
    assert (ref == y_np).all(), "MXU fwd NTT mismatch on device"
    print("MXU fwd bit-exact on device (B=8 probe)", flush=True)
    g = T.tjit(lambda a: mxu_ntt.ntt_mxu(ring, a, (0, 1), inverse=True))
    z = g(y)
    z_np = u.to_u64((np.asarray(z[0]), np.asarray(z[1])))
    assert (z_np == x[:8]).all(), "MXU inv NTT roundtrip mismatch on device"
    print("MXU inv roundtrip bit-exact on device", flush=True)

if "prod" in modes:
    per_call, cs = bench.digest_time(
        lambda a: ring.ntt(a), X, chain=CHAIN, calls=CALLS, label="prod")
    report("prod", per_call)

for p in (8, 16, 32):
    m = f"mxu{p}"
    if m in modes:
        per_call, cs = bench.digest_time(
            lambda a, _p=p: mxu_ntt.ntt_mxu(ring, a, (0, 1), block_polys=_p),
            X, chain=CHAIN, calls=CALLS, label=m)
        report(m, per_call)
