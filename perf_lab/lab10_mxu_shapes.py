"""Measure sustained s8xs8->s32 MXU rate at the four-step NTT's shapes.

A-step per (limb, P-poly block): MA [512,512] @ Xd [512, P*128]
B-step:                          Yd [64*P, 1024] @ MB [1024, 1024]
Both inside one pallas kernel, chained over a grid, so the measurement
includes the VMEM residency pattern the production kernel will have.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 8          # polys per block
G = 32         # grid steps (limb x batch blocks)

rng = np.random.default_rng(0)
MA = jnp.asarray(rng.integers(-128, 128, (512, 512)).astype(np.int8))
MB = jnp.asarray(rng.integers(-128, 128, (1024, 1024)).astype(np.int8))
X = jnp.asarray(rng.integers(-128, 128, (G, 512, P * 128)).astype(np.int8))
Y = jnp.asarray(rng.integers(-128, 128, (G, 64 * P, 1024)).astype(np.int8))


def kern_a(ma, x, o):
    o[:] = jax.lax.dot_general(ma[:], x[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def kern_b(y, mb, o):
    o[:] = jax.lax.dot_general(y[:], mb[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


@jax.jit
def run_a(ma, x):
    return pl.pallas_call(
        kern_a, grid=(G,),
        in_specs=[pl.BlockSpec((512, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 512, P * 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 512, P * 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 512, P * 128), jnp.int32),
    )(ma, x)


@jax.jit
def run_b(y, mb):
    return pl.pallas_call(
        kern_b, grid=(G,),
        in_specs=[pl.BlockSpec((1, 64 * P, 1024), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1024, 1024), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64 * P, 1024), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 64 * P, 1024), jnp.int32),
    )(y, mb)


def bench(fn, *args, macs):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    return dt, macs / dt / 1e12


# squeeze=False variants: kernels get (1, M, K) refs; dot on [0] view
def kern_a3(ma, x, o):
    o[0] = jax.lax.dot_general(ma[:], x[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def kern_b3(y, mb, o):
    o[0] = jax.lax.dot_general(y[0], mb[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


run_a.__wrapped__ = None
macs_a = G * 512 * 512 * P * 128
macs_b = G * 64 * P * 1024 * 1024
try:
    # patch kernels to 3d-aware
    globals()['kern_a'] = kern_a3
    globals()['kern_b'] = kern_b3
    dt, rate = bench(run_a, MA, X, macs=macs_a)
    print(f"A-step [512,512]@[512,{P*128}] x{G}: {dt*1e3:.3f} ms  {rate:.1f} T-MAC/s", flush=True)
    dt, rate = bench(run_b, Y, MB, macs=macs_b)
    print(f"B-step [{64*P},1024]@[1024,1024] x{G}: {dt*1e3:.3f} ms  {rate:.1f} T-MAC/s", flush=True)
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500], flush=True)
