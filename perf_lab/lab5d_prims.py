"""Compute-dominated primitive throughput: long serial chains, small data."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 8
ROWS = 512
SH = (GRID * ROWS, 128)
REPS = 512

def make_kernel(op, dtype, n_ops_per_rep):
    npdt = np.uint32 if dtype == jnp.uint32 else np.float32
    cs = [npdt(3 + 2 * (i % 17)) for i in range(REPS)]
    def kernel(a_ref, b_ref, o_ref):
        acc = a_ref[:]
        b = b_ref[:]
        for i in range(REPS):
            acc = op(acc + cs[i], b)
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
    return run, n_ops_per_rep + 1  # +1 for the mix add

def timeit(name, mk, a, b, calls=20):
    run, ops_per_rep = mk
    o = run(a, b); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(calls):
        o = run(a, b)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / calls
    total = SH[0] * SH[1] * REPS * ops_per_rep
    print(f"{name:34s} {dt*1e3:7.3f} ms -> {total/dt/1e12:7.3f} T op/s", flush=True)

rng = np.random.default_rng(0)
au = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
bu = jnp.asarray(rng.integers(1, 2**31, SH).astype(np.uint32))
af = jnp.asarray(rng.random(SH, dtype=np.float32))
bf = jnp.asarray(rng.random(SH, dtype=np.float32) + 0.5)

timeit("u32: mix-add only", (make_kernel(lambda x, y: x, jnp.uint32, 0)[0], 1), au, bu)
timeit("u32: add", make_kernel(lambda x, y: x + y, jnp.uint32, 1), au, bu)
timeit("u32: mul", make_kernel(lambda x, y: x * y, jnp.uint32, 1), au, bu)
timeit("u32: mul+shr16", make_kernel(lambda x, y: (x * y) >> 16, jnp.uint32, 2), au, bu)
timeit("u32: select", make_kernel(lambda x, y: jnp.where(x > y, x, y), jnp.uint32, 2), au, bu)
timeit("f32: mul", make_kernel(lambda x, y: x * y, jnp.float32, 1), af, bf)
timeit("f32: mul+add (fma?)", make_kernel(lambda x, y: x * y + y, jnp.float32, 2), af, bf)
# the real workload: one full mul_shoup pair chain
from lattigo_tpu.ops import modred, u64 as u
q_int = 576460752303439873
w_int = 123456789012345678 % q_int
ws_int = (w_int << 64) // q_int
def shoup_kernel(al_ref, ah_ref, ol_ref, oh_ref):
    q = u.const64(q_int, (1, 1))
    w = u.const64(w_int, (1, 1))
    ws = u.const64(ws_int, (1, 1))
    two_q = u.const64(2 * q_int, (1, 1))
    x = (al_ref[:], ah_ref[:])
    for i in range(64):
        x = modred.mul_shoup(x, w, ws, q)
        x = u.select64(u.lt64(x, two_q), x, u.sub64(x, two_q))
    ol_ref[:] = x[0]
    oh_ref[:] = x[1]
@jax.jit
def shoup_run(al, ah):
    return pl.pallas_call(
        shoup_kernel,
        out_shape=[jax.ShapeDtypeStruct(SH, jnp.uint32)] * 2,
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        grid=(GRID,),
    )(al, ah)
o = shoup_run(au, bu & jnp.uint32((2**28) - 1)); jax.block_until_ready(o)
t0 = time.time()
for _ in range(20):
    o = shoup_run(au, bu & jnp.uint32((2**28) - 1))
jax.block_until_ready(o)
dt = (time.time() - t0) / 20
n_shoup = SH[0] * SH[1] * 64
print(f"{'mul_shoup+fold (u64 pair)':34s} {dt*1e3:7.3f} ms -> {n_shoup/dt/1e9:7.2f} G shoup/s  ({dt/n_shoup*1e12:5.1f} ps each)", flush=True)
