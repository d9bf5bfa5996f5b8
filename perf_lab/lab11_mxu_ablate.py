"""Ablate the stages of the mxu_ntt kernel to find where time goes.

Variants (all same grid/IO shape as production, N=8192, P=8, L=2, B=256):
  full      — production kernel path (copy of mxu_ntt internals)
  io        — copy in->out only
  digit1    — digitize+stack rows-side only, sum to output
  mm_rows   — digitize + rows matmul, sum planes to output
  mm_both   — both matmuls, no mid combine/twiddle (planes summed)
  mid       — digitize + combine + twiddle only (no matmuls)
  notrans   — full minus the two transposes (wrong result, cost probe)
"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from lattigo_tpu.ops import ring as ring_mod, u64 as u, number_theory as nt
from lattigo_tpu.ops import mxu_ntt, modred

# -- v1-kernel helpers (the production module moved to the v3 choreography;
#    these labs archive the round-3/4 v1 measurements) --------------------
import jax.numpy as _jnp


def _byte_digits_v1(x):
    lo, hi = x
    out = []
    for w in (lo, hi):
        out += [w & 255, (w >> 8) & 255, (w >> 16) & 255, (w >> 24) & 255]
    return out


def _as_i8_v1(planes, axis):
    s = _jnp.stack(planes, axis=axis)
    return (s.astype(_jnp.int32) - 128).astype(_jnp.int8)


def _combine_planes_v1(planes, consts_ref, q):
    from lattigo_tpu.ops import mxu_ntt as _m, modred as _mr, u64 as _u
    pl_u = [p.astype(_jnp.uint32) for p in planes]
    lo_v = (pl_u[0], _jnp.zeros_like(pl_u[0]))
    for e in range(1, 5):
        lo_v = _u.add64(lo_v, _u.shl64((pl_u[e], _jnp.zeros_like(pl_u[e])), 8 * e))
    hi_v = (pl_u[5], _jnp.zeros_like(pl_u[5]))
    for e in range(6, 8):
        hi_v = _u.add64(hi_v, _u.shl64((pl_u[e], _jnp.zeros_like(pl_u[e])), 8 * (e - 5)))
    c40 = _m._smem_c(consts_ref, 1)
    c40s = _m._smem_c(consts_ref, 2)
    return _u.add64(lo_v, _mr.mul_shoup(hi_v, c40, c40s, q))



N = 8192; L = 2; B = 256; P = 8
n1 = 64
qs = nt.generate_ntt_primes(60, N.bit_length() - 1, L)
ring = ring_mod.Ring(N, qs)
t = mxu_ntt._tables_host(ring, (0, 1), False)
rng = np.random.default_rng(7)
x = rng.integers(0, np.array(qs, dtype=np.uint64)[None, :, None], (B, L, N), dtype=np.uint64)
xlo, xhi = u.from_u64(x.reshape(B, L, n1, 128))
xlo, xhi = jax.device_put(xlo), jax.device_put(xhi)

DIG, N2 = 8, 128


def kernel(mode, consts_ref, xl, xh, m_rows, c_rows, ttab, m_lanes, c_lanes, ol, oh):
    q = mxu_ntt._smem_c(consts_ref, 0)
    xx = (xl[:, 0], xh[:, 0])
    if mode == "io":
        ol[:, 0] = xx[0]; oh[:, 0] = xx[1]; return
    if mode in ("digit1", "mm_rows", "mm_both", "full", "notrans"):
        if mode == "notrans":
            tdat = xx
        else:
            tdat = (jnp.transpose(xx[0], (1, 0, 2)), jnp.transpose(xx[1], (1, 0, 2)))
        planes = _byte_digits_v1(tdat)
        d1 = _as_i8_v1(planes, axis=0).reshape(DIG * n1, P * N2)
        if mode == "digit1":
            s = d1.astype(jnp.int32).reshape(DIG, n1, P, N2).sum(axis=0)
            ol[:, 0] = jnp.transpose(s.astype(jnp.uint32), (1, 0, 2))
            oh[:, 0] = ol[:, 0]; return
        o = jax.lax.dot_general(m_rows[0], d1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = o + c_rows[0]
        mid = [o[e * n1:(e + 1) * n1] for e in range(DIG)]
        if mode == "mm_rows":
            s = sum(p.astype(jnp.uint32) for p in mid).reshape(n1, P, N2)
            ol[:, 0] = jnp.transpose(s, (1, 0, 2)); oh[:, 0] = ol[:, 0]; return
        if mode == "mm_both":
            # fake digits from the raw planes (low byte), skip combine/twiddle
            y = (mid[0].astype(jnp.uint32).reshape(n1, P, N2),
                 mid[1].astype(jnp.uint32).reshape(n1, P, N2))
        else:
            v = _combine_planes_v1(mid, consts_ref, q)
            vv = (v[0].reshape(n1, P, N2), v[1].reshape(n1, P, N2))
            tw = (ttab[0, 0][:, None, :], ttab[0, 1][:, None, :])
            tsh = (ttab[0, 2][:, None, :], ttab[0, 3][:, None, :])
            tco = (ttab[0, 4][:, None, :], ttab[0, 5][:, None, :])
            y = u.add64(modred.mul_shoup(vv, tw, tsh, q), tco)
        if mode == "notrans":
            yt = y
        else:
            yt = (jnp.transpose(y[0], (1, 0, 2)), jnp.transpose(y[1], (1, 0, 2)))
        planes2 = _byte_digits_v1(yt)
        d2 = _as_i8_v1(planes2, axis=2).reshape(P * n1, DIG * N2)
        o2 = jax.lax.dot_general(d2, m_lanes[0], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        o2 = o2 + c_lanes[0]
        fin = [o2[:, e * N2:(e + 1) * N2] for e in range(DIG)]
        if mode == "mm_both":
            s = sum(p.astype(jnp.uint32) for p in fin)
            ol[:, 0] = s.reshape(P, n1, N2); oh[:, 0] = ol[:, 0]; return
        v = _combine_planes_v1(fin, consts_ref, q)
        cf = mxu_ntt._smem_c(consts_ref, 3)
        u0 = mxu_ntt._smem_c(consts_ref, 4)
        out = modred.bred_add(u.add64(v, cf), q, u0)
        ol[:, 0] = out[0].reshape(P, n1, N2)
        oh[:, 0] = out[1].reshape(P, n1, N2)
        return
    if mode == "mid":
        planes = [xx[0].reshape(n1 * P, N2)] * 8
        v = _combine_planes_v1(planes, consts_ref, q)
        vv = (v[0].reshape(n1, P, N2), v[1].reshape(n1, P, N2))
        tw = (ttab[0, 0][:, None, :], ttab[0, 1][:, None, :])
        tsh = (ttab[0, 2][:, None, :], ttab[0, 3][:, None, :])
        tco = (ttab[0, 4][:, None, :], ttab[0, 5][:, None, :])
        y = u.add64(modred.mul_shoup(vv, tw, tsh, q), tco)
        ol[:, 0] = jnp.transpose(y[0], (1, 0, 2))
        oh[:, 0] = jnp.transpose(y[1], (1, 0, 2))
        return


def build(mode):
    nb = B // P
    vm = pltpu.VMEM
    dn1, dn2 = DIG * n1, DIG * N2
    limb = lambda l, b: (l, 0, 0)
    limb4 = lambda l, b: (l, 0, 0, 0)
    blk = lambda l, b: (b, l, 0, 0)
    call = pl.pallas_call(
        functools.partial(kernel, mode),
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda l, b: (l, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((1, dn1, dn1), limb, memory_space=vm),
            pl.BlockSpec((1, dn1, 1), limb, memory_space=vm),
            pl.BlockSpec((1, 6, n1, N2), limb4, memory_space=vm),
            pl.BlockSpec((1, dn2, dn2), limb, memory_space=vm),
            pl.BlockSpec((1, 1, dn2), limb, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((B, L, n1, N2), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: call(t["consts"], a, b, t["m_rows"], t["c_rows"],
                                     t["ttab"], t["m_lanes"], t["c_lanes"]))


for mode in ["io", "digit1", "mm_rows", "mid", "mm_both", "notrans", "full"]:
    try:
        fn = build(mode)
        o = fn(xlo, xhi); jax.block_until_ready(o)
        t0 = time.perf_counter(); reps = 10
        for _ in range(reps): o = fn(xlo, xhi)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{mode:8s}: {dt*1e3:7.2f} ms  ({dt/ (L*B//P)*1e6:6.1f} us/step)", flush=True)
    except Exception as e:
        print(f"{mode:8s}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
