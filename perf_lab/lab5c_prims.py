"""Primitive throughput with real data traversal (moving block windows)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 128
ROWS = 512
SH = (GRID * ROWS, 128)
REPS = 32

def make_kernel(op, dtype):
    npdt = np.uint32 if dtype == jnp.uint32 else np.float32
    cs = [npdt(3 + 2 * i) for i in range(REPS)]
    def kernel(a_ref, b_ref, o_ref):
        acc = a_ref[:]
        b = b_ref[:]
        for i in range(REPS):
            acc = op(acc + cs[i], b)   # add-mix prevents reassociation for mul/select
        o_ref[:] = acc
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SH, dtype),
            in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            grid=(GRID,),
        )(a, b)
    return run

def timeit(name, run, a, b, calls=10):
    o = run(a, b); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(calls):
        o = run(a, b)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / calls
    total = SH[0] * SH[1] * REPS
    print(f"{name:28s} {dt*1e3:7.3f} ms -> {total/dt/1e12:7.3f} T pair-op/s", flush=True)

rng = np.random.default_rng(0)
au = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
bu = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
af = jnp.asarray(rng.random(SH, dtype=np.float32))
bf = jnp.asarray(rng.random(SH, dtype=np.float32) + 0.5)

timeit("u32 add-mix only (2N adds)", make_kernel(lambda x, y: x, jnp.uint32), au, bu)  # mix only
timeit("u32 mul (mix+mul)", make_kernel(lambda x, y: x * y, jnp.uint32), au, bu)
timeit("u32 add (mix+add)", make_kernel(lambda x, y: x + y, jnp.uint32), au, bu)
timeit("u32 shr16 (mix+shr)", make_kernel(lambda x, y: x >> 16, jnp.uint32), au, bu)
timeit("u32 sel (mix+sel)", make_kernel(lambda x, y: jnp.where(x > y, x, y), jnp.uint32), au, bu)
timeit("f32 mul (mix+mul)", make_kernel(lambda x, y: x * y, jnp.float32), af, bf)
timeit("f32 fma-ish (mix+x*y+x)", make_kernel(lambda x, y: x * y + x, jnp.float32), af, bf)
