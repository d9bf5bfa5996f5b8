"""Does operand pairing structure (same-vreg vs offset-half) explain the 6x
gap between shoup-chain (140G/s) and butterfly stages (21G/s)?"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lattigo_tpu.ops import modred, u64 as u

n, B, L, lanes = 8192, 1024, 2, 128
nb = B // lanes
NTTS = B * L
ROWS = 512
q_int = 576460752303439873
w_int = 123456789012345678 % q_int
ws_int = (w_int << 64) // q_int
rng = np.random.default_rng(0)
XL = (jnp.asarray(rng.integers(0, 2**32, (L*nb, n, lanes), dtype=np.uint32)),
      jnp.asarray(rng.integers(0, 2**28, (L*nb, n, lanes), dtype=np.uint32)))
CONST = lambda v, s=(1,1): u.const64(v, s)
def _fold(x, tq):
    return u.select64(u.lt64(tq, x), u.sub64(x, tq), x)

# All kernels perform exactly 2 full-block shoup+fold+2add+1sub volumes x2 reps
REP = 2
def k_chain(xl, xh, ol, oh):
    """single stream: x = butterfly(x, x) with SAME array as both operands"""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    x = (xl[0], xh[0])
    for s in range(2 * REP):
        uu = _fold(x, two_q)
        mv = modred.mul_shoup(x, w, ws, q)
        a = u.add64(uu, mv)
        b = u.sub64(u.add64(uu, two_q), mv)
        x = u.select64(u.lt64(a, b), a, b)  # keep both alive, merge
    ol[0] = x[0]; oh[0] = x[1]

def k_halves(xl, xh, ol, oh):
    """offset halves (the real butterfly structure)"""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    uu = (xl[0][:ROWS//2], xh[0][:ROWS//2])
    vv = (xl[0][ROWS//2:], xh[0][ROWS//2:])
    for s in range(4 * REP):
        f = _fold(uu, two_q)
        mv = modred.mul_shoup(vv, w, ws, q)
        uu = u.add64(f, mv)
        vv = u.sub64(u.add64(f, two_q), mv)
    ol[0] = jnp.concatenate([uu[0], vv[0]], 0)
    oh[0] = jnp.concatenate([uu[1], vv[1]], 0)

def k_sep(xl, xh, ol, oh):
    """two streams but same vreg index: planes of the two input refs"""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    uu = (xl[0], jnp.zeros_like(xl[0]))
    vv = (xh[0], jnp.zeros_like(xh[0]))
    for s in range(2 * REP):
        f = _fold(uu, two_q)
        mv = modred.mul_shoup(vv, w, ws, q)
        uu = u.add64(f, mv)
        vv = u.sub64(u.add64(f, two_q), mv)
    ol[0] = uu[0] ^ vv[0]; oh[0] = uu[1] ^ vv[1]

def build(kern):
    vm = pltpu.VMEM
    return pl.pallas_call(
        kern, grid=(L*nb, n//ROWS),
        in_specs=[pl.BlockSpec((1, ROWS, lanes), lambda i, j: (i, j, 0), memory_space=vm)] * 2,
        out_specs=[pl.BlockSpec((1, ROWS, lanes), lambda i, j: (i, j, 0), memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((L*nb, n, lanes), jnp.uint32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )

def timeit(name, call, z, chain=20, calls=3):
    @jax.jit
    def chained(z):
        out = jax.lax.fori_loop(0, chain, lambda _, a: call(a[0], a[1]), z)
        d = jnp.sum(out[0], dtype=jnp.uint32) ^ jnp.sum(out[1], dtype=jnp.uint32)
        return out, d
    t0c = time.time(); z2, d = chained(z); _ = int(d); tc = time.time()-t0c
    t0 = time.time()
    for _ in range(calls):
        z2, d = chained(z2); _ = int(d)
    per_call = (time.time()-t0)/(chain*calls)
    print(f"{name:44s} {per_call*1e3:8.3f} ms   (compile {tc:.0f}s)", flush=True)

timeit("chain: same-operand butterflies", build(k_chain), XL)
timeit("halves: offset-half butterflies", build(k_halves), XL)
timeit("sep: same-index two-stream", build(k_sep), XL)
