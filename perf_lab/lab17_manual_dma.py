"""Manual async-DMA streaming probe: can a pallas kernel with an explicit
K-deep DMA ring beat the ~275 GB/s auto-pipelined BlockSpec copy?

Copies the headline working set (B=1024, L=2, N=8192, two u32 planes,
268 MB r+w) through VMEM with DEPTH outstanding copies per direction.
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
ROWS = B * L * n1  # flatten to [ROWS, 128] for simple row blocking
GBYTES = (ROWS * N2 * 4 * 2) * 2 / 1e9

rng = np.random.default_rng(5)
xlo = rng.integers(0, 2**32, (ROWS, N2), dtype=np.uint64).astype(np.uint32)
xhi = rng.integers(0, 2**32, (ROWS, N2), dtype=np.uint64).astype(np.uint32)
X = (jax.device_put(xlo), jax.device_put(xhi))


def build(block_rows, depth):
    nblk = ROWS // block_rows

    def kernel(xl, xh, ol, oh, buf_l, buf_h, sin, sout):
        def body(k, _):
            slot = jax.lax.rem(k, depth)

            @pl.when(k < nblk)
            def _start():
                pltpu.make_async_copy(
                    xl.at[pl.ds(k * block_rows, block_rows)],
                    buf_l.at[slot], sin.at[slot, 0]).start()
                pltpu.make_async_copy(
                    xh.at[pl.ds(k * block_rows, block_rows)],
                    buf_h.at[slot], sin.at[slot, 1]).start()

            j = k - (depth - 1)

            @pl.when(jnp.logical_and(j >= 0, j < nblk))
            def _drain():
                slot_j = jax.lax.rem(j, depth)
                # wait for this slot's input, compute, write back async
                pltpu.make_async_copy(
                    xl.at[pl.ds(j * block_rows, block_rows)],
                    buf_l.at[slot_j], sin.at[slot_j, 0]).wait()
                pltpu.make_async_copy(
                    xh.at[pl.ds(j * block_rows, block_rows)],
                    buf_h.at[slot_j], sin.at[slot_j, 1]).wait()
                buf_l[slot_j] = buf_l[slot_j] + 1
                buf_h[slot_j] = buf_h[slot_j] + 1
                # wait for previous output DMA on this slot before reusing
                @pl.when(j >= depth)
                def _wout():
                    pltpu.make_async_copy(
                        buf_l.at[slot_j],
                        ol.at[pl.ds((j - depth) * block_rows, block_rows)],
                        sout.at[slot_j, 0]).wait()
                    pltpu.make_async_copy(
                        buf_h.at[slot_j],
                        oh.at[pl.ds((j - depth) * block_rows, block_rows)],
                        sout.at[slot_j, 1]).wait()

                pltpu.make_async_copy(
                    buf_l.at[slot_j],
                    ol.at[pl.ds(j * block_rows, block_rows)],
                    sout.at[slot_j, 0]).start()
                pltpu.make_async_copy(
                    buf_h.at[slot_j],
                    oh.at[pl.ds(j * block_rows, block_rows)],
                    sout.at[slot_j, 1]).start()
            return 0

        jax.lax.fori_loop(0, nblk + depth - 1, body, 0)
        # drain remaining output DMAs
        def drain(j, _):
            @pl.when(j >= max(0, nblk - depth))
            def _():
                slot_j = jax.lax.rem(j, depth)
                pltpu.make_async_copy(
                    buf_l.at[slot_j],
                    ol.at[pl.ds(j * block_rows, block_rows)],
                    sout.at[slot_j, 0]).wait()
                pltpu.make_async_copy(
                    buf_h.at[slot_j],
                    oh.at[pl.ds(j * block_rows, block_rows)],
                    sout.at[slot_j, 1]).wait()
            return 0
        jax.lax.fori_loop(max(0, nblk - depth), nblk, drain, 0)

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, N2), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((depth, block_rows, N2), jnp.uint32),
            pltpu.VMEM((depth, block_rows, N2), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    return lambda z: tuple(call(z[0], z[1]))


for spec in (sys.argv[1:] or ["1024x4", "2048x4", "2048x8", "4096x4"]):
    br, depth = (int(v) for v in spec.split("x"))
    try:
        fn = build(br, depth)
        per_call, _ = bench.digest_time(fn, X, chain=200, calls=2, label=spec)
        print(f"{spec:8s}: {per_call*1e6:8.1f} us/iter  "
              f"{GBYTES/per_call:7.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{spec:8s}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
