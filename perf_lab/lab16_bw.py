"""HBM streaming bandwidth probes (honest chained timing).

What is the real achievable read+write bandwidth on this v5e through
different paths?  All modes stream the headline NTT working set
(B=1024, L=2, N=8192, two u32 planes = 134 MB; 268 MB r+w per iter).

  xla     chained x+1 in pure XLA (fusion ceiling)
  pio16   pallas copy, current v2 blocking: grid (L, nb), P=16 strided
  pio64   same, P=64
  cio16   contiguous blocks: grid (nb,), block (P, L, n1, 128), P=16
  cio64   same, P=64
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

B, L, n1, N2 = 1024, 2, 64, 128
GB = (B * L * n1 * N2 * 4 * 2) * 2 / 1e9  # r+w, both planes

rng = np.random.default_rng(5)
xlo = rng.integers(0, 2**32, (B, L, n1, N2), dtype=np.uint64).astype(np.uint32)
xhi = rng.integers(0, 2**32, (B, L, n1, N2), dtype=np.uint64).astype(np.uint32)
X = (jax.device_put(xlo), jax.device_put(xhi))

modes = sys.argv[1:] or ["xla", "pio16", "pio64", "cio16", "cio64"]


def report(label, per_call):
    print(f"{label:7s}: {per_call*1e6:9.1f} us/iter  {GB/per_call:7.1f} GB/s",
          flush=True)


if "xla" in modes:
    per_call, _ = bench.digest_time(
        lambda z: (z[0] + 1, z[1] + 1), X, chain=20, calls=4, label="xla")
    report("xla", per_call)


def strided_io(P):
    def kern(xl, xh, ol, oh):
        ol[:, 0] = xl[:, 0] + 1
        oh[:, 0] = xh[:, 0] + 1

    blk = lambda l, b: (b, l, 0, 0)
    call = pl.pallas_call(
        kern,
        grid=(L, B // P),
        in_specs=[pl.BlockSpec((P, 1, n1, N2), blk, memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((P, 1, n1, N2), blk, memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, L, n1, N2), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    return lambda z: tuple(call(z[0], z[1]))


def contig_io(P):
    def kern(xl, xh, ol, oh):
        ol[...] = xl[...] + 1
        oh[...] = xh[...] + 1

    blk = lambda b: (b, 0, 0, 0)
    call = pl.pallas_call(
        kern,
        grid=(B // P,),
        in_specs=[pl.BlockSpec((P, L, n1, N2), blk, memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((P, L, n1, N2), blk, memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, L, n1, N2), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    return lambda z: tuple(call(z[0], z[1]))


for m in modes:
    if m.startswith("pio"):
        per_call, _ = bench.digest_time(
            strided_io(int(m[3:])), X, chain=20, calls=4, label=m)
        report(m, per_call)
    if m.startswith("cio"):
        per_call, _ = bench.digest_time(
            contig_io(int(m[3:])), X, chain=20, calls=4, label=m)
        report(m, per_call)
