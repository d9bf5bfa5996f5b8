"""Primitive throughput, fold-proof: alternate a cheap xor with the op under
test so the chain cannot be reassociated/strength-reduced."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH = (1024, 128)
REPS = 64

def make_kernel(op, dtype, mix):
    import numpy as _np
    npdt = _np.uint32 if dtype == jnp.uint32 else _np.float32
    cs = [npdt(3 + 2 * i) for i in range(REPS)]
    def kernel(a_ref, b_ref, o_ref):
        acc = a_ref[:]
        b = b_ref[:]
        for i in range(REPS):
            acc = op(mix(acc, cs[i]), b)
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
    total = SH[0] * SH[1] * REPS * 512
    print(f"{name:28s} {dt*1e3:7.3f} ms -> {total/dt/1e12:7.3f} T(op+mix)/s", flush=True)

rng = np.random.default_rng(0)
au = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
bu = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
af = jnp.asarray(rng.random(SH, dtype=np.float32))
bf = jnp.asarray(rng.random(SH, dtype=np.float32) + 0.5)

xor_mix = lambda x, c: x ^ c
fadd_mix = lambda x, c: x + c

# baseline: xor-only chain (the mix op alone, 64 of them)
timeit("u32 xor chain (baseline)", make_kernel(lambda x, y: x, jnp.uint32, xor_mix), au, bu)
timeit("u32 mul (+xor mix)", make_kernel(lambda x, y: x * y, jnp.uint32, xor_mix), au, bu)
timeit("u32 add (+xor mix)", make_kernel(lambda x, y: x + y, jnp.uint32, xor_mix), au, bu)
timeit("u32 shr16+add (+xor mix)", make_kernel(lambda x, y: (x >> 16) + y, jnp.uint32, xor_mix), au, bu)
timeit("u32 select (+xor mix)", make_kernel(lambda x, y: jnp.where(x > y, x, y), jnp.uint32, xor_mix), au, bu)
timeit("f32 add chain (baseline)", make_kernel(lambda x, y: x, jnp.float32, fadd_mix), af, bf)
timeit("f32 mul (+add mix)", make_kernel(lambda x, y: x * y, jnp.float32, fadd_mix), af, bf)
