"""Pallas TPU kernel for the negacyclic NTT/InvNTT.

Design (v2, roll-based): one grid program transforms one RNS limb of one
polynomial entirely in VMEM.  The coefficient vector lives in a single
[64, 128] layout for ALL stages — no reshapes, no interleaves, no transposes
(measured 170x slower when staged through Mosaic relayouts).  Butterfly
partners are fetched with pltpu.roll along sublanes (stride >= 128) or lanes
(stride < 128), and each element computes its own output with a U/V select:
2x the multiplies of the pair-shared form, but every op runs at full vector
width, which measures ~2 orders of magnitude faster.

Twiddles are full per-stage planes precomputed host-side in the same
[64, 128] layout (plain + Shoup forms).  Programs are ordered limb-major so
consecutive programs reuse the resident twiddle block instead of re-DMAing
it.  Outputs are bit-identical to the reference schedule (exact final
reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lattigo_tpu.ops import modred
from lattigo_tpu.ops import u64 as u

U64 = u.U64
_C = 128  # lane width
_SUB = 8  # f32 sublane quantum (rows per tile)


def _scal(ref, k):
    return (
        jnp.reshape(ref[0, 0, 2 * k], (1, 1)),
        jnp.reshape(ref[0, 0, 2 * k + 1], (1, 1)),
    )


def _fold(x, two_q):
    return u.select64(u.lt64(two_q, x), u.sub64(x, two_q), x)


def _stages(n: int):
    """Butterfly strides t = n/2 ... 1 (forward order)."""
    out = []
    t = n // 2
    while t >= 1:
        out.append(t)
        t //= 2
    return out


def _roll_exchange(x: U64, axis: int, dist: int) -> U64:
    """Default partner fetch: pltpu.roll with the (normalized) stage shift."""
    s = dist % x[0].shape[axis]
    return (pltpu.roll(x[0], s, axis), pltpu.roll(x[1], s, axis))


EXCHANGE = _roll_exchange


def _mm_exchange(x: U64, P: jnp.ndarray, axis: int) -> U64:
    """Partner fetch as an MXU matmul with a 0/1 permutation matrix.

    pltpu.roll / vector shuffles measure ~40x slower than the whole butterfly
    arithmetic on this hardware; a permutation matmul is exact for 16-bit
    halves in f32 (single nonzero per row) and rides the otherwise-idle MXU.
    """
    dn = (((1,), (0,)), ((), ())) if axis == 0 else (((1,), (0,)), ((), ()))

    def one(plane):
        # Mosaic lacks direct u32<->f32 casts; route through int32 (values
        # are < 2^16 so every step is exact)
        h0 = (plane & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        h1 = (plane >> 16).astype(jnp.int32).astype(jnp.float32)
        if axis == 0:
            r0 = jax.lax.dot_general(P, h0, dn, preferred_element_type=jnp.float32)
            r1 = jax.lax.dot_general(P, h1, dn, preferred_element_type=jnp.float32)
        else:
            r0 = jax.lax.dot_general(h0, P, dn, preferred_element_type=jnp.float32)
            r1 = jax.lax.dot_general(h1, P, dn, preferred_element_type=jnp.float32)
        i0 = r0.astype(jnp.int32).astype(jnp.uint32)
        i1 = r1.astype(jnp.int32).astype(jnp.uint32)
        return i0 | (i1 << 16)

    return one(x[0]), one(x[1])


def _is_u_mask(n: int, t: int):
    """Boolean [R, C] plane: True where the element is the U half of its
    butterfly pair at stride t (flat index p: (p % 2t) < t)."""
    R = n // _C
    if t >= _C:
        s = t // _C
        row = jax.lax.broadcasted_iota(jnp.int32, (R, _C), 0)
        return (row % (2 * s)) < s
    col = jax.lax.broadcasted_iota(jnp.int32, (R, _C), 1)
    return (col % (2 * t)) < t


def _kernel(n, inverse, consts_ref, xl, xh, tw_ref, pa_ref, pb_ref, ol, oh):
    R = n // _C
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)

    x = (xl[0].reshape(R, _C), xh[0].reshape(R, _C))

    stages = _stages(n)
    if inverse:
        stages = stages[::-1]

    ia = ib = 0
    for si, t in enumerate(stages):
        f = (tw_ref[0, si, 0], tw_ref[0, si, 1])
        fs = (tw_ref[0, si, 2], tw_ref[0, si, 3])
        is_u = _is_u_mask(n, t)
        axis, dist = (0, t // _C) if t >= _C else (1, t)

        if not inverse:
            folded = _fold(x, two_q)
            mont = modred.mul_shoup(x, f, fs, q)        # V*psi at V positions
            mv_at_u = EXCHANGE(mont, axis, -dist)       # U <- partner V product
            fu_at_v = EXCHANGE(folded, axis, dist)      # V <- partner U folded
            out_u = u.add64(folded, mv_at_u)
            out_v = u.sub64(u.add64(fu_at_v, two_q), mont)
            x = u.select64(is_u, out_u, out_v)
        else:
            v_at_u = EXCHANGE(x, axis, -dist)           # U <- partner V
            u_at_v = EXCHANGE(x, axis, dist)            # V <- partner U
            sum_u = _fold(u.add64(x, v_at_u), two_q)
            diff = u.sub64(u.add64(u_at_v, two_q), x)
            prod_v = modred.mul_shoup(diff, f, fs, q)
            x = u.select64(is_u, sum_u, prod_v)

    if not inverse:
        u0 = _scal(consts_ref, 2)
        r = modred.bred_add(x, q, u0)
    else:
        ninv = _scal(consts_ref, 3)
        ninv_s = _scal(consts_ref, 4)
        r = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)
    ol[0] = r[0].reshape(1, n)
    oh[0] = r[1].reshape(1, n)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, n_limbs: int, rows_per_limb: int, inverse: bool, interpret: bool):
    R = n // _C
    n_stages = len(_stages(n))
    n_a = sum(1 for t in _stages(n) if t >= _C)
    n_b = n_stages - n_a
    grid = n_limbs * rows_per_limb
    kernel = functools.partial(_kernel, n, inverse)
    # limb-major row order: consecutive programs share the twiddle block
    limb3 = lambda i: (jax.lax.div(i, rows_per_limb), 0, 0)
    limb5 = lambda i: (jax.lax.div(i, rows_per_limb), 0, 0, 0, 0)
    row3 = lambda i: (i, 0, 0)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), limb3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), row3, memory_space=vm),
            pl.BlockSpec((1, 1, n), row3, memory_space=vm),
            pl.BlockSpec((1, n_stages, 4, R, _C), limb5, memory_space=vm),
            # permutation matmul tables, limb-independent: one fetch
            pl.BlockSpec(
                (n_a, 2, R, R), lambda i: (0, 0, 0, 0), memory_space=vm
            ),
            pl.BlockSpec(
                (n_b, 2, _C, _C), lambda i: (0, 0, 0, 0), memory_space=vm
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n), row3, memory_space=vm),
            pl.BlockSpec((1, 1, n), row3, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, 1, n), jnp.uint32),
            jax.ShapeDtypeStruct((grid, 1, n), jnp.uint32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _tables(ring, limbs: tuple[int, ...], inverse: bool):
    n = ring.n
    R = n // _C
    idx = np.array(limbs)
    plain, shoup = ring.shoup_twiddles(inverse)
    plain, shoup = plain[idx], shoup[idx]
    L = len(limbs)
    stages = _stages(n)
    if inverse:
        stages = stages[::-1]

    tw = np.zeros((L, len(stages), 4, R, _C), dtype=np.uint32)
    for si, t in enumerate(stages):
        base = n // (2 * t)  # psi index base == group count
        full_p = np.repeat(plain[:, base : 2 * base], 2 * t, axis=1)  # [L, n]
        full_s = np.repeat(shoup[:, base : 2 * base], 2 * t, axis=1)
        tw[:, si, 0] = (full_p & 0xFFFFFFFF).astype(np.uint32).reshape(L, R, _C)
        tw[:, si, 1] = (full_p >> 32).astype(np.uint32).reshape(L, R, _C)
        tw[:, si, 2] = (full_s & 0xFFFFFFFF).astype(np.uint32).reshape(L, R, _C)
        tw[:, si, 3] = (full_s >> 32).astype(np.uint32).reshape(L, R, _C)

    def perm(size, d):
        m = np.zeros((size, size), dtype=np.float32)
        m[np.arange(size), (np.arange(size) + d) % size] = 1.0
        return m

    pa_list, pb_list = [], []
    for t in stages:
        if t >= _C:
            d = t // _C
            # used as P @ h: row i reads source row (i +/- d)
            pa_list.append(np.stack([perm(R, d), perm(R, -d)]))
        else:
            # used as h @ Q: Q = M^T so column i reads source lane (i +/- d)
            pb_list.append(np.stack([perm(_C, t).T, perm(_C, -t).T]))
    pa = np.stack(pa_list) if pa_list else np.zeros((0, 2, R, R), np.float32)
    pb = np.stack(pb_list) if pb_list else np.zeros((0, 2, _C, _C), np.float32)

    consts = np.zeros((L, 1, 16), dtype=np.uint32)
    for k, l in enumerate(limbs):
        q = ring.moduli[l]
        ninv_mont = int(
            u.to_u64((ring.n_inv_[0][l : l + 1, 0], ring.n_inv_[1][l : l + 1, 0]))[0]
        )
        ninv = ninv_mont * pow(1 << 64, -1, q) % q
        vals = [q, 2 * q, ring.bred[l][0], ninv, (ninv << 64) // q]
        for j, v in enumerate(vals):
            consts[k, 0, 2 * j] = v & 0xFFFFFFFF
            consts[k, 0, 2 * j + 1] = (v >> 32) & 0xFFFFFFFF
    return consts, tw, pa, pb


def ntt_pallas(ring, x: U64, limbs: tuple[int, ...], inverse: bool = False, interpret: bool = False) -> U64:
    """Transform x [..., L, N]: one Pallas program per (batch row, limb),
    limb-major so twiddle blocks stay VMEM-resident across programs."""
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    assert L == len(limbs)
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    grid = B * L

    consts, tw, pa, pb = _tables(ring, tuple(limbs), inverse)
    call = _build_call(n, L, B, inverse, interpret)

    # [.., L, n] -> limb-major rows [L, B, n]
    lo_r = lo.reshape(B, L, n).swapaxes(0, 1).reshape(grid, 1, n)
    hi_r = hi.reshape(B, L, n).swapaxes(0, 1).reshape(grid, 1, n)
    ol, oh = call(consts, lo_r, hi_r, tw, pa, pb)
    ol = ol.reshape(L, B, n).swapaxes(0, 1).reshape(*batch, L, n)
    oh = oh.reshape(L, B, n).swapaxes(0, 1).reshape(*batch, L, n)
    return ol, oh


# ---------------------------------------------------------------------------
# Batch-on-lanes kernel: the TPU-native schedule.
#
# 64 polynomials ride the lane axis; coefficients live on sublanes, so every
# butterfly stage is a sublane-only regrouping (the lane dimension never
# changes) and the butterfly is pair-shared: fold U, one Shoup product for V,
# no masks, no rolls, no transposes.  This sidesteps every Mosaic relayout
# pathology found with roll/permutation formulations (see git history).
# ---------------------------------------------------------------------------

_LANES = 64


def _kernel_bl(n, inverse, consts_ref, xl, xh, wpl, wph, wsl, wsh, ol, oh):
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)
    q3 = (q[0].reshape(1, 1, 1), q[1].reshape(1, 1, 1))
    two_q3 = (two_q[0].reshape(1, 1, 1), two_q[1].reshape(1, 1, 1))

    x = (xl[0], xh[0])            # (N, LANES)
    wp = (wpl[0], wph[0])         # (N, 1, 1)
    ws = (wsl[0], wsh[0])

    stages = _stages(n)
    if inverse:
        stages = stages[::-1]

    for t in stages:
        m = n // (2 * t)
        lo_r = x[0].reshape(m, 2, t, _LANES)
        hi_r = x[1].reshape(m, 2, t, _LANES)
        uu = (lo_r[:, 0], hi_r[:, 0])
        vv = (lo_r[:, 1], hi_r[:, 1])
        f = (wp[0][m : 2 * m], wp[1][m : 2 * m])          # (m, 1, 1)
        fs = (ws[0][m : 2 * m], ws[1][m : 2 * m])

        if not inverse:
            uu = _fold(uu, two_q3)
            vv = modred.mul_shoup(vv, f, fs, q3)
            x_new = u.add64(uu, vv)
            y_new = u.sub64(u.add64(uu, two_q3), vv)
        else:
            x_new = _fold(u.add64(uu, vv), two_q3)
            y_new = modred.mul_shoup(
                u.sub64(u.add64(uu, two_q3), vv), f, fs, q3
            )

        lo = jnp.stack([x_new[0], y_new[0]], axis=1)       # (m, 2, t, LANES)
        hi = jnp.stack([x_new[1], y_new[1]], axis=1)
        x = (lo.reshape(n, _LANES), hi.reshape(n, _LANES))

    if not inverse:
        u0 = _scal(consts_ref, 2)
        r = modred.bred_add(x, q, u0)
    else:
        ninv = _scal(consts_ref, 3)
        ninv_s = _scal(consts_ref, 4)
        r = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)
    ol[0] = r[0]
    oh[0] = r[1]


@functools.lru_cache(maxsize=None)
def _build_call_bl(n: int, n_limbs: int, n_batches: int, inverse: bool, interpret: bool):
    kernel = functools.partial(_kernel_bl, n, inverse)
    grid = n_limbs * n_batches
    limb3 = lambda i: (jax.lax.div(i, n_batches), 0, 0)
    limb4 = lambda i: (jax.lax.div(i, n_batches), 0, 0, 0)
    row3 = lambda i: (i, 0, 0)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), limb3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, _LANES), row3, memory_space=vm),
            pl.BlockSpec((1, n, _LANES), row3, memory_space=vm),
            pl.BlockSpec((1, n, 1, 1), limb4, memory_space=vm),
            pl.BlockSpec((1, n, 1, 1), limb4, memory_space=vm),
            pl.BlockSpec((1, n, 1, 1), limb4, memory_space=vm),
            pl.BlockSpec((1, n, 1, 1), limb4, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, n, _LANES), row3, memory_space=vm),
            pl.BlockSpec((1, n, _LANES), row3, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((grid, n, _LANES), jnp.uint32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _tables_bl(ring, limbs: tuple[int, ...], inverse: bool):
    """Per-limb psi tables as (N, 1) columns + the SMEM constant rows."""
    idx = np.array(limbs)
    plain, shoup = ring.shoup_twiddles(inverse)
    plain, shoup = plain[idx], shoup[idx]
    consts, _, _, _ = _tables(ring, limbs, inverse)[:4] if False else (None,) * 4
    # reuse the constant packing from _tables without its twiddle planes
    L = len(limbs)
    consts = np.zeros((L, 1, 16), dtype=np.uint32)
    for k, l in enumerate(limbs):
        q = ring.moduli[l]
        ninv_mont = int(
            u.to_u64((ring.n_inv_[0][l : l + 1, 0], ring.n_inv_[1][l : l + 1, 0]))[0]
        )
        ninv = ninv_mont * pow(1 << 64, -1, q) % q
        vals = [q, 2 * q, ring.bred[l][0], ninv, (ninv << 64) // q]
        for j, v in enumerate(vals):
            consts[k, 0, 2 * j] = v & 0xFFFFFFFF
            consts[k, 0, 2 * j + 1] = (v >> 32) & 0xFFFFFFFF
    col = lambda t: t[:, :, None, None]
    wp = u.from_u64(col(plain))
    ws = u.from_u64(col(shoup))
    return consts, wp, ws


def _passes(n: int, inverse: bool, head_size: int = 3, tail_max: int = 16) -> list[list[int]]:
    """Group butterfly stages into multi-level register passes.

    Forward (strides n/2 .. 1): head stages with stride >= tail_max in
    register groups of ``head_size``, then the sub-tail_max strides as one
    full-width roll pass.  Inverse runs the same groups in reverse order
    with each group's strides ascending.  Grouping levels in registers
    divides the per-stage slice/interleave relayout traffic by the group
    size — the dominant cost of every earlier schedule (see PERF_NOTES.md).
    """
    stages = _stages(n)  # n/2 .. 1
    head = [t for t in stages if t >= tail_max]
    tail = [t for t in stages if t < tail_max]
    groups = [head[i : i + head_size] for i in range(0, len(head), head_size)]
    if tail:
        groups.append(tail)
    if inverse:
        groups = [g[::-1] for g in groups[::-1]]
    return groups


def _kernel_packed(n, inverse, tail_mode, consts_ref, xl, xh, t_ref, ol, oh):
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)
    q3 = (q[0].reshape(1, 1, 1), q[1].reshape(1, 1, 1))
    two_q3 = (two_q[0].reshape(1, 1, 1), two_q[1].reshape(1, 1, 1))

    lanes = xl.shape[-1]
    x = (xl[0], xh[0])  # (n, lanes)
    T = t_ref[0]        # (n//2 or n, 128) packed twiddle columns

    # absolute stage index -> packed column base (stage order is fixed by
    # direction: forward n/2..1, inverse 1..n/2 — the table builder uses the
    # same order)
    stage_order = _stages(n)
    if inverse:
        stage_order = stage_order[::-1]
    col_of = {t: 4 * si for si, t in enumerate(stage_order)}

    def tail_roll(x, group):
        """Full-width tail: partner fetch by fixed sublane rolls, per-row
        U/V select; twiddles are full n-row columns at lanes 64+."""
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        for j, t in enumerate(group):
            c0 = 64 + 4 * j
            f = (T[:, c0 + 0].reshape(n, 1), T[:, c0 + 1].reshape(n, 1))
            fs = (T[:, c0 + 2].reshape(n, 1), T[:, c0 + 3].reshape(n, 1))
            is_u = (row % (2 * t)) < t
            roll = lambda a, d: (
                pltpu.roll(a[0], d % n, axis=0),
                pltpu.roll(a[1], d % n, axis=0),
            )
            if not inverse:
                folded = _fold(x, two_q)
                mont = modred.mul_shoup(x, f, fs, q)
                out_u = u.add64(folded, roll(mont, -t))
                out_v = u.sub64(u.add64(roll(folded, t), two_q), mont)
            else:
                out_u = _fold(u.add64(x, roll(x, -t)), two_q)
                diff = u.sub64(u.add64(roll(x, t), two_q), x)
                out_v = modred.mul_shoup(diff, f, fs, q)
            x = u.select64(is_u, out_u, out_v)
        return x

    for group in _passes(n, inverse):
        if tail_mode == "roll" and min(group) < 16:
            x = tail_roll(x, group)
            continue
        t_slice = min(group)
        P = (max(group) * 2) // t_slice
        M = n // (P * t_slice)
        x4l = x[0].reshape(M, P, t_slice, lanes)
        x4h = x[1].reshape(M, P, t_slice, lanes)
        parts = [(x4l[:, b], x4h[:, b]) for b in range(P)]

        for sigma in group:
            d = sigma // t_slice  # partner distance in parts
            c0 = col_of[sigma]
            # packed radix-2 column for stage sigma, reshaped so that
            # slice [:, a, r] broadcasts against the (a, r)-th V part
            shp = (M, P // (2 * d), d, t_slice, 1)
            TH = T[: n // 2]
            cw = (TH[:, c0 + 0].reshape(shp), TH[:, c0 + 1].reshape(shp))
            cs = (TH[:, c0 + 2].reshape(shp), TH[:, c0 + 3].reshape(shp))
            for a in range(P // (2 * d)):
                for r in range(d):
                    iu = 2 * a * d + r
                    iv = iu + d
                    uu, vv = parts[iu], parts[iv]
                    f = (cw[0][:, a, r], cw[1][:, a, r])
                    fs = (cs[0][:, a, r], cs[1][:, a, r])
                    if not inverse:
                        uu = _fold(uu, two_q3)
                        mv = modred.mul_shoup(vv, f, fs, q3)
                        parts[iu] = u.add64(uu, mv)
                        parts[iv] = u.sub64(u.add64(uu, two_q3), mv)
                    else:
                        parts[iu] = _fold(u.add64(uu, vv), two_q3)
                        diff = u.sub64(u.add64(uu, two_q3), vv)
                        parts[iv] = modred.mul_shoup(diff, f, fs, q3)

        lo = jnp.stack([p[0] for p in parts], axis=1).reshape(n, lanes)
        hi = jnp.stack([p[1] for p in parts], axis=1).reshape(n, lanes)
        x = (lo, hi)

    if not inverse:
        u0 = _scal(consts_ref, 2)
        r = modred.bred_add(x, q, u0)
    else:
        ninv = _scal(consts_ref, 3)
        ninv_s = _scal(consts_ref, 4)
        r = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)
    ol[0] = r[0]
    oh[0] = r[1]


@functools.lru_cache(maxsize=None)
def _build_call_packed(n: int, n_limbs: int, n_batches: int, lanes: int, inverse: bool, interpret: bool, tail_mode: str = "gather"):
    kernel = functools.partial(_kernel_packed, n, inverse, tail_mode)
    grid = n_limbs * n_batches
    t_rows = n if tail_mode == "roll" else n // 2
    limb3 = lambda i: (jax.lax.div(i, n_batches), 0, 0)
    row3 = lambda i: (i, 0, 0)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), limb3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, n, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, t_rows, 128), limb3, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, n, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, n, lanes), row3, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((grid, n, lanes), jnp.uint32),
        ],
        # transform in place: the coefficient planes are dead after the pass
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _tables_packed(ring, limbs: tuple[int, ...], inverse: bool, tail_mode: str = "gather"):
    """One (n/2, 128) uint32 table per limb: lane 4*si..4*si+3 hold the
    stage-si twiddle column (plain lo/hi, Shoup lo/hi) where the column is
    the stage's twiddles repeated across its butterfly span — the pair-shared
    V half is always exactly n/2 rows, so every stage shares this shape.
    With tail_mode="roll" the table has n rows and tail stages additionally
    store full-width columns (value per coefficient row) at lanes 64+."""
    n = ring.n
    idx = np.array(limbs)
    plain, shoup = ring.shoup_twiddles(inverse)
    plain, shoup = plain[idx], shoup[idx]
    L = len(limbs)
    stages = _stages(n)
    if inverse:
        stages = stages[::-1]
    assert 4 * len(stages) <= 128, "packed table supports log2(n) <= 32"

    t_rows = n if tail_mode == "roll" else n // 2
    T = np.zeros((L, t_rows, 128), dtype=np.uint32)
    for si, t in enumerate(stages):
        m = n // (2 * t)
        colp = np.repeat(plain[:, m : 2 * m], t, axis=1)  # [L, n/2]
        cols = np.repeat(shoup[:, m : 2 * m], t, axis=1)
        T[:, : n // 2, 4 * si + 0] = (colp & 0xFFFFFFFF).astype(np.uint32)
        T[:, : n // 2, 4 * si + 1] = (colp >> 32).astype(np.uint32)
        T[:, : n // 2, 4 * si + 2] = (cols & 0xFFFFFFFF).astype(np.uint32)
        T[:, : n // 2, 4 * si + 3] = (cols >> 32).astype(np.uint32)

    if tail_mode == "roll":
        tail = [g for g in _passes(n, inverse) if min(g) < 16]
        for j, t in enumerate(tail[0] if tail else []):
            m = n // (2 * t)
            fp = np.repeat(plain[:, m : 2 * m], 2 * t, axis=1)  # [L, n]
            fs = np.repeat(shoup[:, m : 2 * m], 2 * t, axis=1)
            T[:, :, 64 + 4 * j + 0] = (fp & 0xFFFFFFFF).astype(np.uint32)
            T[:, :, 64 + 4 * j + 1] = (fp >> 32).astype(np.uint32)
            T[:, :, 64 + 4 * j + 2] = (fs & 0xFFFFFFFF).astype(np.uint32)
            T[:, :, 64 + 4 * j + 3] = (fs >> 32).astype(np.uint32)

    consts = np.zeros((L, 1, 16), dtype=np.uint32)
    for k, l in enumerate(limbs):
        q = ring.moduli[l]
        ninv_mont = int(
            u.to_u64((ring.n_inv_[0][l : l + 1, 0], ring.n_inv_[1][l : l + 1, 0]))[0]
        )
        ninv = ninv_mont * pow(1 << 64, -1, q) % q
        vals = [q, 2 * q, ring.bred[l][0], ninv, (ninv << 64) // q]
        for j, v in enumerate(vals):
            consts[k, 0, 2 * j] = v & 0xFFFFFFFF
            consts[k, 0, 2 * j + 1] = (v >> 32) & 0xFFFFFFFF
    return consts, T


def ntt_pallas_packed(
    ring,
    x: U64,
    limbs: tuple[int, ...],
    inverse: bool = False,
    interpret: bool = False,
    lanes: int = _LANES,
    tail_mode: str = "gather",
) -> U64:
    """Packed-twiddle multi-radix transform: batch on lanes, one Pallas
    program per (limb, lane-group); all stage twiddles ride one natural
    (n/2, 128) VMEM block per limb."""
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    pad = (-B) % lanes
    nb = (B + pad) // lanes

    consts, T = _tables_packed(ring, tuple(limbs), inverse, tail_mode)
    call = _build_call_packed(n, L, nb, lanes, inverse, interpret, tail_mode)

    def to_lanes(a):
        a = a.reshape(B, L, n)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, L, n), dtype=a.dtype)], axis=0)
        a = a.transpose(1, 0, 2).reshape(L, nb, lanes, n)
        return a.swapaxes(-1, -2).reshape(L * nb, n, lanes)

    def from_lanes(a):
        a = a.reshape(L, nb, n, lanes).swapaxes(-1, -2)
        a = a.reshape(L, nb * lanes, n)[:, :B].transpose(1, 0, 2)
        return a.reshape(*batch, L, n)

    ol, oh = call(consts, to_lanes(lo), to_lanes(hi), T)
    return from_lanes(ol), from_lanes(oh)


def _kernel_pass(n, inverse, group, tail_roll_pass, first, final, consts_ref, xl, xh, t_ref, ol, oh):
    """One butterfly pass (a group of stages) as its own kernel.

    Splitting passes into separate pallas_calls keeps each Mosaic module
    small (compile time grows superlinearly with the unrolled op count of
    the monolithic 13-stage kernel) at the cost of one HBM round trip of
    the coefficient planes per pass — ~8MB/pass at N=8192×64 lanes, well
    under the measured per-NTT budget at batch ≥64.
    """
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)
    q3 = (q[0].reshape(1, 1, 1), q[1].reshape(1, 1, 1))
    two_q3 = (two_q[0].reshape(1, 1, 1), two_q[1].reshape(1, 1, 1))

    lanes = xl.shape[-1]
    x = (xl[0], xh[0])  # (n, lanes)
    T = t_ref[0]

    if inverse and first:
        # callers may hand in lazily reduced values (< 4q); the inverse
        # butterfly's U path needs < 2q operands (two folds: 4q -> 2q)
        x = _fold(_fold(x, two_q), two_q)

    if tail_roll_pass:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        for j, t in enumerate(group):
            c0 = 4 * j
            f = (T[:, c0 + 0].reshape(n, 1), T[:, c0 + 1].reshape(n, 1))
            fs = (T[:, c0 + 2].reshape(n, 1), T[:, c0 + 3].reshape(n, 1))
            is_u = (row % (2 * t)) < t
            roll = lambda a, d: (
                pltpu.roll(a[0], d % n, axis=0),
                pltpu.roll(a[1], d % n, axis=0),
            )
            if not inverse:
                folded = _fold(x, two_q)
                mont = modred.mul_shoup(x, f, fs, q)
                out_u = u.add64(folded, roll(mont, -t))
                out_v = u.sub64(u.add64(roll(folded, t), two_q), mont)
            else:
                out_u = _fold(u.add64(x, roll(x, -t)), two_q)
                diff = u.sub64(u.add64(roll(x, t), two_q), x)
                out_v = modred.mul_shoup(diff, f, fs, q)
            x = u.select64(is_u, out_u, out_v)
    else:
        t_slice = min(group)
        P = (max(group) * 2) // t_slice
        M = n // (P * t_slice)
        x4l = x[0].reshape(M, P, t_slice, lanes)
        x4h = x[1].reshape(M, P, t_slice, lanes)
        parts = [(x4l[:, b], x4h[:, b]) for b in range(P)]

        for j, sigma in enumerate(group):
            d = sigma // t_slice
            c0 = 4 * j
            # stage column as (M, n_pairs_in_M, t_slice): row block for the
            # (a, r)-th V part starts at pair index (2*a*d + r) ... the V
            # half column layout repeats each twiddle t_slice times already
            TH = T[: n // 2]
            npair = P // 2
            cw = (
                TH[:, c0 + 0].reshape(M, npair, t_slice, 1),
                TH[:, c0 + 1].reshape(M, npair, t_slice, 1),
            )
            cs = (
                TH[:, c0 + 2].reshape(M, npair, t_slice, 1),
                TH[:, c0 + 3].reshape(M, npair, t_slice, 1),
            )
            for a in range(P // (2 * d)):
                for r in range(d):
                    iu = 2 * a * d + r
                    iv = iu + d
                    pair = a * d + r  # index among the n/2 V rows
                    uu, vv = parts[iu], parts[iv]
                    f = (cw[0][:, pair], cw[1][:, pair])
                    fs = (cs[0][:, pair], cs[1][:, pair])
                    if not inverse:
                        uu = _fold(uu, two_q3)
                        mv = modred.mul_shoup(vv, f, fs, q3)
                        parts[iu] = u.add64(uu, mv)
                        parts[iv] = u.sub64(u.add64(uu, two_q3), mv)
                    else:
                        parts[iu] = _fold(u.add64(uu, vv), two_q3)
                        diff = u.sub64(u.add64(uu, two_q3), vv)
                        parts[iv] = modred.mul_shoup(diff, f, fs, q3)

        lo = jnp.stack([p[0] for p in parts], axis=1).reshape(n, lanes)
        hi = jnp.stack([p[1] for p in parts], axis=1).reshape(n, lanes)
        x = (lo, hi)

    if final:
        if not inverse:
            u0 = _scal(consts_ref, 2)
            x = modred.bred_add(x, q, u0)
        else:
            ninv = _scal(consts_ref, 3)
            ninv_s = _scal(consts_ref, 4)
            x = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)
    ol[0] = x[0]
    oh[0] = x[1]


@functools.lru_cache(maxsize=None)
def _build_call_pass(n, n_limbs, n_batches, lanes, inverse, group, tail_roll_pass, first, final, interpret, rows):
    """rows = row-block height: passes whose butterflies couple only rows
    within an aligned ``rows`` window tile the coefficient axis, shrinking
    VMEM residency and multiplying grid steps for DMA/compute overlap."""
    kernel = functools.partial(_kernel_pass, rows, inverse, group, tail_roll_pass, first, final)
    grid = (n_limbs * n_batches, n // rows)
    t_rows = rows if tail_roll_pass else rows // 2
    limb3 = lambda i, j: (jax.lax.div(i, n_batches), j, 0)
    row3 = lambda i, j: (i, j, 0)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i, j: (jax.lax.div(i, n_batches), 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, rows, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, t_rows, 128), limb3, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, lanes), row3, memory_space=vm),
            pl.BlockSpec((1, rows, lanes), row3, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_limbs * n_batches, n, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((n_limbs * n_batches, n, lanes), jnp.uint32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _tables_pass(ring, limbs: tuple[int, ...], inverse: bool, group: tuple[int, ...], tail_roll_pass: bool):
    """Per-pass twiddle table: columns 4j..4j+3 hold stage group[j]'s
    (plain lo/hi, Shoup lo/hi) V-half column (n/2 rows), or the full-width
    n-row column for a roll-tail pass."""
    n = ring.n
    idx = np.array(limbs)
    plain, shoup = ring.shoup_twiddles(inverse)
    plain, shoup = plain[idx], shoup[idx]
    L = len(limbs)
    t_rows = n if tail_roll_pass else n // 2
    T = np.zeros((L, t_rows, 128), dtype=np.uint32)
    for j, t in enumerate(group):
        m = n // (2 * t)
        rep = 2 * t if tail_roll_pass else t
        colp = np.repeat(plain[:, m : 2 * m], rep, axis=1)
        cols = np.repeat(shoup[:, m : 2 * m], rep, axis=1)
        T[:, : colp.shape[1], 4 * j + 0] = (colp & 0xFFFFFFFF).astype(np.uint32)
        T[:, : colp.shape[1], 4 * j + 1] = (colp >> 32).astype(np.uint32)
        T[:, : colp.shape[1], 4 * j + 2] = (cols & 0xFFFFFFFF).astype(np.uint32)
        T[:, : colp.shape[1], 4 * j + 3] = (cols >> 32).astype(np.uint32)
    return T


def ntt_pallas_passes(
    ring,
    x: U64,
    limbs: tuple[int, ...],
    inverse: bool = False,
    interpret: bool = False,
    lanes: int = _LANES,
    head_size: int = 4,
    tail_max: int = 32,
    min_rows: int = 1024,
) -> U64:
    """Pass-split packed transform: one pallas_call per multi-stage pass
    (register head groups, fixed-shift roll tail), row-blocked where the
    pass's butterfly span allows.  Same math as ntt_pallas_packed; trades
    one HBM round trip per pass for per-kernel Mosaic modules small enough
    to compile."""
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    pad = (-B) % lanes
    nb = (B + pad) // lanes

    consts, _ = _tables_packed(ring, tuple(limbs), inverse, "gather")
    groups = _passes(n, inverse, head_size, tail_max)

    def to_lanes(a):
        a = a.reshape(B, L, n)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, L, n), dtype=a.dtype)], axis=0)
        a = a.transpose(1, 0, 2).reshape(L, nb, lanes, n)
        return a.swapaxes(-1, -2).reshape(L * nb, n, lanes)

    def from_lanes(a):
        a = a.reshape(L, nb, n, lanes).swapaxes(-1, -2)
        a = a.reshape(L, nb * lanes, n)[:, :B].transpose(1, 0, 2)
        return a.reshape(*batch, L, n)

    cl, ch = to_lanes(lo), to_lanes(hi)
    for gi, group in enumerate(groups):
        tail = min(group) < tail_max
        final = gi == len(groups) - 1
        # butterfly span: rows coupled by this pass (aligned window)
        span = 2 * max(group)
        rows = min(n, max(span, min_rows))
        T = _tables_pass(ring, tuple(limbs), inverse, tuple(group), tail)
        call = _build_call_pass(
            n, L, nb, lanes, inverse, tuple(group), tail, gi == 0, final,
            interpret, rows,
        )
        cl, ch = call(consts, cl, ch, T)
    return from_lanes(cl), from_lanes(ch)


def ntt_pallas_batched(ring, x: U64, limbs: tuple[int, ...], inverse: bool = False, interpret: bool = False) -> U64:
    """Batch-on-lanes transform: requires total batch divisible by 64 (the
    wrapper pads otherwise).  x: [..., L, N]."""
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    pad = (-B) % _LANES
    nb = (B + pad) // _LANES

    consts, wp, ws = _tables_bl(ring, tuple(limbs), inverse)
    call = _build_call_bl(n, L, nb, inverse, interpret)

    def to_lanes(a):
        a = a.reshape(B, L, n)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, L, n), dtype=a.dtype)], axis=0
            )
        # [B', L, n] -> [L, nb, n, LANES]
        a = a.transpose(1, 0, 2).reshape(L, nb, _LANES, n)
        return a.swapaxes(-1, -2).reshape(L * nb, n, _LANES)

    def from_lanes(a):
        a = a.reshape(L, nb, n, _LANES).swapaxes(-1, -2)
        a = a.reshape(L, nb * _LANES, n)[:, :B].transpose(1, 0, 2)
        return a.reshape(*batch, L, n)

    ol, oh = call(consts, to_lanes(lo), to_lanes(hi), wp[0], wp[1], ws[0], ws[1])
    return from_lanes(ol), from_lanes(oh)
