"""Primitive VPU throughput: u32 mul vs add vs f32 ops, in a Pallas kernel."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH = (1024, 128)  # one block
REPS = 64          # ops chained in-kernel per element

def make_kernel(op, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for i in range(REPS):
            acc = op(acc, b)
        o_ref[:] = acc
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SH, dtype),
            in_specs=[pl.BlockSpec(SH, lambda i: (0, 0), memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(SH, lambda i: (0, 0), memory_space=pltpu.VMEM),
            grid=(512,),
        )(a, b)
    return run

def timeit(name, run, a, b, calls=5):
    o = run(a, b); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(calls):
        o = run(a, b)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / calls
    total_ops = SH[0] * SH[1] * REPS * 512
    print(f"{name:24s} {dt*1e3:7.3f} ms -> {total_ops/dt/1e12:7.2f} T op/s", flush=True)

rng = np.random.default_rng(0)
au = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
bu = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
af = jnp.asarray(rng.random(SH, dtype=np.float32))
bf = jnp.asarray(rng.random(SH, dtype=np.float32) + 0.5)
ai = au.astype(jnp.int32); bi = bu.astype(jnp.int32)

timeit("u32 add", make_kernel(lambda x, y: x + y, jnp.uint32), au, bu)
timeit("u32 mul", make_kernel(lambda x, y: x * y, jnp.uint32), au, bu)
timeit("i32 mul", make_kernel(lambda x, y: x * y, jnp.int32), ai, bi)
timeit("u32 xor", make_kernel(lambda x, y: x ^ y, jnp.uint32), au, bu)
timeit("u32 shift", make_kernel(lambda x, y: (x >> 16) + y, jnp.uint32), au, bu)
timeit("f32 add", make_kernel(lambda x, y: x + y, jnp.float32), af, bf)
timeit("f32 mul", make_kernel(lambda x, y: x * y, jnp.float32), af, bf)
timeit("f32 fma", make_kernel(lambda x, y: x * y + x, jnp.float32), af, bf)
timeit("u32 select", make_kernel(lambda x, y: jnp.where(x > y, x, y), jnp.uint32), au, bu)
# 16-bit-ish mul: operands < 2^16
au16 = au & jnp.uint32(0xFFFF); bu16 = bu & jnp.uint32(0xFFFF)
timeit("u32 mul (16b vals)", make_kernel(lambda x, y: x * y, jnp.uint32), au16, bu16)
