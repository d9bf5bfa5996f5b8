"""Gate: exact s8 x s8 -> s32 matmul on v5e MXU via Pallas + throughput."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 256, 128, 128
def kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

@jax.jit
def run(a, b):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(a, b)

rng = np.random.default_rng(0)
a = rng.integers(-128, 128, (M, K)).astype(np.int8)
b = rng.integers(-128, 128, (K, N)).astype(np.int8)
try:
    o = np.asarray(run(jnp.asarray(a), jnp.asarray(b)))
    ref = a.astype(np.int64) @ b.astype(np.int64)
    print("int8 matmul exact:", bool((o == ref).all()), flush=True)
except Exception as e:
    print("int8 matmul FAILED:", type(e).__name__, str(e)[:300], flush=True)

# bf16 exact small-int matmul check
ab = rng.integers(-128, 128, (M, K)).astype(np.float32)
bb = rng.integers(-128, 128, (K, N)).astype(np.float32)
def kernel_bf(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
@jax.jit
def run_bf(a, b):
    return pl.pallas_call(
        kernel_bf,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(a, b)
try:
    o = np.asarray(run_bf(jnp.asarray(ab, dtype=jnp.bfloat16).astype(jnp.bfloat16),
                          jnp.asarray(bb, dtype=jnp.bfloat16).astype(jnp.bfloat16)))
    ref = ab.astype(np.int64) @ bb.astype(np.int64)
    print("bf16 small-int matmul exact:", bool((o.astype(np.int64) == ref).all()), flush=True)
except Exception as e:
    print("bf16 matmul FAILED:", type(e).__name__, str(e)[:300], flush=True)

# throughput: batched int8 matmul at four-step-like shapes
BM, BK, BN, G = 512, 128, 128, 64
def kernel_b(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
@jax.jit
def run_b(a, b):
    return pl.pallas_call(
        kernel_b,
        grid=(G,),
        in_specs=[pl.BlockSpec((BM, BK), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BK, BN), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, BN), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * BM, BN), jnp.int32),
    )(a, b)
if True:
    try:
        A = jnp.asarray(rng.integers(-128, 128, (G * BM, BK)).astype(np.int8))
        Bm = jnp.asarray(rng.integers(-128, 128, (BK, BN)).astype(np.int8))
        o = run_b(A, Bm); jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(50):
            o = run_b(A, Bm)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / 50
        macs = G * BM * BK * BN
        print(f"int8 MXU throughput: {dt*1e3:.3f} ms -> {macs/dt/1e12:.1f} T-MAC/s", flush=True)
    except Exception as e:
        print("int8 throughput FAILED:", type(e).__name__, str(e)[:300], flush=True)
