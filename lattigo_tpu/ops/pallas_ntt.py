"""Pallas TPU kernel for the negacyclic NTT/InvNTT.

Production schedule: ``ntt_pallas_passes`` — the transform is split into a
few multi-stage register passes (Cooley-Tukey DIT with the reference's
bit-reversed merged-psi twiddle order, ring/ntt.go:53-139), each pass one
pallas_call over (rows, lanes) blocks with the polynomial batch riding the
lane axis.  Head passes gather butterfly partners as part slices held in
registers (pair-shared: one Shoup product per butterfly); the sub-16-stride
tail uses fixed-shift pltpu.roll partner fetches with a per-element U/V
select.  Outputs are bit-identical to the reference schedule (exact final
reduction).

perf_lab/ + PERF_NOTES.md document the round-1/2 ablations: this schedule is
within ~10% of the v5e VPU ceiling for exact u32-pair Shoup arithmetic; the
experimental kernels they explored (monolithic packed-twiddle, batch-on-
lanes with (N,1,1) tables, MXU permutation exchange) were pruned in round 2.
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
from lattigo_tpu.tjit import table

U64 = u.U64
_C = 128  # lane width
_LANES = 64  # default batch lanes per program


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


@functools.lru_cache(maxsize=None)
def _consts_table(ring, limbs: tuple[int, ...]) -> np.ndarray:
    """Per-limb SMEM constant rows: q, 2q, Barrett u0, plain N^-1, and its
    Shoup word, each as (lo32, hi32)."""
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
    return consts


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

    consts = _consts_table(ring, tuple(limbs))
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
        T = table(
            f"{ring.key}/pallasT/{tuple(limbs)}/{int(inverse)}/{tuple(group)}/{int(tail)}",
            lambda: _tables_pass(ring, tuple(limbs), inverse, tuple(group), tail),
        )
        call = _build_call_pass(
            n, L, nb, lanes, inverse, tuple(group), tail, gi == 0, final,
            interpret, rows,
        )
        cl, ch = call(consts, cl, ch, T)
    return from_lanes(cl), from_lanes(ch)

