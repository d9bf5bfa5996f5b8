"""Attribute pass cost: same op volume, different data organization.
All variants use FAKE twiddles (cost attribution only)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lattigo_tpu.ops import modred, u64 as u

n, B, L, lanes = 8192, 1024, 2, 128
nb = B // lanes
NTTS = B * L
q_int = 576460752303439873
w_int = 123456789012345678 % q_int
ws_int = (w_int << 64) // q_int
rng = np.random.default_rng(0)
XL = (jnp.asarray(rng.integers(0, 2**32, (L*nb, n, lanes), dtype=np.uint32)),
      jnp.asarray(rng.integers(0, 2**28, (L*nb, n, lanes), dtype=np.uint32)))

CONST = lambda v, s=(1,1): u.const64(v, s)

def _fold(x, tq):
    return u.select64(u.lt64(tq, x), u.sub64(x, tq), x)

def butterfly(uu, vv, w, ws, q, two_q):
    uu = _fold(uu, two_q)
    mv = modred.mul_shoup(vv, w, ws, q)
    return u.add64(uu, mv), u.sub64(u.add64(uu, two_q), mv)

ROWS = 512

def k_straight(xl, xh, ol, oh):
    """4 stage-equivalents of butterfly math on contiguous halves (2D),
    zero slicing beyond one half split."""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    x = (xl[0], xh[0])  # (ROWS, lanes)
    for s in range(4):
        uu = (x[0][:ROWS//2], x[1][:ROWS//2])
        vv = (x[0][ROWS//2:], x[1][ROWS//2:])
        a, b = butterfly(uu, vv, w, ws, q, two_q)
        x = (jnp.concatenate([a[0], b[0]], 0), jnp.concatenate([a[1], b[1]], 0))
    ol[0] = x[0]; oh[0] = x[1]

def k_parts(xl, xh, ol, oh):
    """pass2-shaped: 16 parts of (32,128), 4 stages with strided pair walk,
    one stack at the end."""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    P, t_slice = 16, 32
    x2l = xl[0].reshape(P, t_slice, lanes)
    x2h = xh[0].reshape(P, t_slice, lanes)
    parts = [(x2l[b], x2h[b]) for b in range(P)]
    for sigma in (256, 128, 64, 32):
        d = sigma // t_slice
        for a in range(P // (2*d)):
            for r in range(d):
                iu = 2*a*d + r; iv = iu + d
                parts[iu], parts[iv] = butterfly(parts[iu], parts[iv], w, ws, q, two_q)
    lo = jnp.stack([p[0] for p in parts], 0).reshape(ROWS, lanes)
    hi = jnp.stack([p[1] for p in parts], 0).reshape(ROWS, lanes)
    ol[0] = lo; oh[0] = hi

def k_parts_nostack(xl, xh, ol, oh):
    """parts + per-part output writes (no stack)."""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    P, t_slice = 16, 32
    x2l = xl[0].reshape(P, t_slice, lanes)
    x2h = xh[0].reshape(P, t_slice, lanes)
    parts = [(x2l[b], x2h[b]) for b in range(P)]
    for sigma in (256, 128, 64, 32):
        d = sigma // t_slice
        for a in range(P // (2*d)):
            for r in range(d):
                iu = 2*a*d + r; iv = iu + d
                parts[iu], parts[iv] = butterfly(parts[iu], parts[iv], w, ws, q, two_q)
    for b in range(P):
        ol[0, b*t_slice:(b+1)*t_slice] = parts[b][0]
        oh[0, b*t_slice:(b+1)*t_slice] = parts[b][1]

def k_flat(xl, xh, ol, oh):
    """pure arithmetic: 4x butterfly volume on full 2D block, partner = same
    block (wrong math, measures op ceiling: 2 half-blocks -> use halves without
    regrouping)."""
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    x = (xl[0], xh[0])
    uu = (x[0][:ROWS//2], x[1][:ROWS//2])
    vv = (x[0][ROWS//2:], x[1][ROWS//2:])
    for s in range(4):
        uu, vv = butterfly(uu, vv, w, ws, q, two_q)
    ol[0] = jnp.concatenate([uu[0], vv[0]], 0)
    oh[0] = jnp.concatenate([uu[1], vv[1]], 0)

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
    print(f"{name:44s} {per_call*1e3:8.3f} ms  {NTTS/per_call/1e3:8.1f}k NTT/s-equiv  (compile {tc:.0f}s)", flush=True)

sk = lambda *a, **k: None
sk("flat: 4x butterfly, zero movement", build(k_flat), XL)
sk("straight: halves + concat per stage", build(k_straight), XL)
sk("parts(16x32rows) + final stack", build(k_parts), XL)
sk("parts(16x32rows) + per-part writes", build(k_parts_nostack), XL)

def k_copy(xl, xh, ol, oh):
    ol[0] = xl[0]; oh[0] = xh[0]

def k_flat8(xl, xh, ol, oh):
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    x = (xl[0], xh[0])
    uu = (x[0][:ROWS//2], x[1][:ROWS//2])
    vv = (x[0][ROWS//2:], x[1][ROWS//2:])
    for s in range(8):
        uu, vv = butterfly(uu, vv, w, ws, q, two_q)
    ol[0] = jnp.concatenate([uu[0], vv[0]], 0)
    oh[0] = jnp.concatenate([uu[1], vv[1]], 0)

def k_flat16(xl, xh, ol, oh):
    q = CONST(q_int); two_q = CONST(2*q_int); w = CONST(w_int); ws = CONST(ws_int)
    x = (xl[0], xh[0])
    uu = (x[0][:ROWS//2], x[1][:ROWS//2])
    vv = (x[0][ROWS//2:], x[1][ROWS//2:])
    for s in range(16):
        uu, vv = butterfly(uu, vv, w, ws, q, two_q)
    ol[0] = jnp.concatenate([uu[0], vv[0]], 0)
    oh[0] = jnp.concatenate([uu[1], vv[1]], 0)

timeit("pure copy (DMA floor)", build(k_copy), XL)
timeit("flat x8 stages", build(k_flat8), XL)
timeit("flat x16 stages", build(k_flat16), XL)
