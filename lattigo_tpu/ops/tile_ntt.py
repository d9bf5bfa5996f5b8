"""Single-pass Pallas tile NTT: full throughput at ANY batch size.

The lanes-batched kernel (:mod:`lattigo_tpu.ops.pallas_ntt`) rides the
polynomial *batch* on the VPU lane axis, so a bare ``[L, N]`` poly — every
single-ciphertext scheme op — used to fall back to the ~10x slower roll
schedule.  This kernel instead lays ONE polynomial out as an
``(n1, 128)`` tile (row r, lane c = coefficient ``r*128 + c``) and runs the
reference's complete merged-psi DIT schedule (ring/ntt.go:53-139) inside a
single pallas_call per (batch, limb) row:

* stages with butterfly stride ``t >= 128`` couple tile *rows* — register
  part-slices for large strides, fixed-shift sublane rolls for small ones;
* stages with ``t < 128`` run on the *transposed* ``(128, n1)`` tile where
  they couple rows again — one in-register transpose each way instead of
  lane-axis rolls (measured ~1000x slower than sublane rolls on v5e).

Two exact identities collapse the transposed phase's per-element twiddle
planes (~n values per stage, the bandwidth/compute killer):

1. Bit-reversal factorization.  For stride ``t``, ``m = N/(2t)``,
   ``gcn = 64/t``, element (r, c) of stage s needs
   ``psiT[m + r*gcn + c//(2t)]``, and because ``bitrev(m + k)`` splits
   linearly over the high/low bits of ``k``,

       psiT[m + r*gcn + cg] == A_s[r] * B_s[cg]   (mod q)

   with ``A_s[r] = psiT[m + r*gcn] * psiT[m]^-1``, ``B_s[cg] = psiT[m+cg]``.

2. Row-twist push-through.  The per-row factors obey ``A_s[r] = mu_r^{t_s}``
   with ``mu_r = A_{t=1}[r]``, and scaling a DIT stage's twiddles by
   ``mu^t`` equals pre-scaling input position k by ``mu^k`` (each stage
   clears one bit of the position, so no residual output diagonal).  Hence
   the whole transposed phase is ONE static pre-twist multiply by
   ``TW[c, r] = mu_r^c`` followed by 7 stages with *shared* (row-only)
   twiddle columns — plain Shoup butterflies, half of them pair-shared.
   The inverse applies the mirrored shared stages then the ``mu_r^{-c}``
   post-twist.

Both identities are asserted exhaustively at table-build time, and outputs
are bit-identical to the reference schedule (exact final reduction).
Tables are tjit-managed device arguments.
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
from lattigo_tpu.ops.pallas_ntt import _consts_table, _fold, _scal
from lattigo_tpu.tjit import table

U64 = u.U64
_C = 128  # lane width / column count of the tile
_ROLL_MAX = 4  # strides <= this run as sublane rolls (else part slices)


def _slice_roll_split(total_rows: int) -> tuple[list[int], list[int]]:
    """(slice strides, roll strides) in row units, stride-descending."""
    head, roll = [], []
    tr = total_rows // 2
    while tr >= 1:
        (head if tr > _ROLL_MAX else roll).append(tr)
        tr //= 2
    return head, roll


def _shoup_of(vals: np.ndarray, q: int) -> np.ndarray:
    return np.array([(int(v) << 64) // q for v in vals.tolist()], dtype=np.uint64)


def _words(vals: np.ndarray, q: int):
    """(plain lo, plain hi, shoup lo, shoup hi) uint32 rows for vals < q."""
    sh = _shoup_of(vals, q)
    return (
        (vals & 0xFFFFFFFF).astype(np.uint32),
        (vals >> 32).astype(np.uint32),
        (sh & 0xFFFFFFFF).astype(np.uint32),
        (sh >> 32).astype(np.uint32),
    )


def _build_tables(ring, limbs: tuple[int, ...], inverse: bool):
    """Host tables per limb:

    * ``TROW [L, n1, 128]`` — row-stage twiddle columns: slice-stage V-half
      columns at cols 4j..4j+3, then roll-stage full columns;
    * ``TCOL [L, 128, 32]`` — transposed-phase *shared* stage columns
      (stride-t stage s at cols 4s..4s+3): V-half for slice stages, full
      width for roll stages;
    * ``TTW  [L, 4*128, n1]`` — the mu_r^c twist plane (its own mu per
      direction), four word-planes stacked on the row axis.
    """
    n = ring.n
    n1 = n // _C
    row_head, row_roll = _slice_roll_split(n1)
    col_head, col_roll = _slice_roll_split(_C)
    L = len(limbs)
    plain_all, _ = ring.shoup_twiddles(inverse)
    plain_fwd_all, _ = ring.shoup_twiddles(False)
    plain_all = plain_all[np.array(limbs)]
    plain_fwd_all = plain_fwd_all[np.array(limbs)]

    TROW = np.zeros((L, n1, _C), dtype=np.uint32)
    TCOL = np.zeros((L, _C, 32), dtype=np.uint32)
    TTW = np.zeros((L, 4 * _C, n1), dtype=np.uint32)
    for k in range(L):
        q = ring.moduli[limbs[k]]
        plain = plain_all[k]
        for j, tr in enumerate(row_head):  # V-half column, repeated t_r
            m = n1 // (2 * tr)
            col = np.repeat(plain[m : 2 * m], tr)
            for w, row in enumerate(_words(col, q)):
                TROW[k, : n1 // 2, 4 * j + w] = row
        off = 4 * len(row_head)
        for j, tr in enumerate(row_roll):  # full column, repeated 2*t_r
            m = n1 // (2 * tr)
            col = np.repeat(plain[m : 2 * m], 2 * tr)
            for w, row in enumerate(_words(col, q)):
                TROW[k, :, off + 4 * j + w] = row

        # transposed phase: shared columns B_s + twist plane.  All 7 stages
        # run roll-form (full-width columns): part-slice passes on the
        # transposed half-lane-width tile send the Mosaic compiler into a
        # multi-minute relayout search, and the shared single-Shoup
        # butterflies are cheap enough that slicing isn't worth it.
        mu = None
        stages = col_head + col_roll  # 64..1 stride-descending
        for s, t in enumerate(stages):
            m = n // (2 * t)
            gcn = _C // (2 * t)
            b = plain[m : m + gcn].astype(object)
            a = (
                plain[m : m + n1 * gcn : gcn].astype(object)
                * pow(int(plain[m]), -1, q)
                % q
            )
            # identity 1: exact bit-reversal factorization
            assert (
                (a[:, None] * b[None, :]) % q
                == plain[m : 2 * m].reshape(n1, gcn).astype(object)
            ).all(), (t, limbs[k])
            if t == 1:
                mu = a  # A_{t=1}[r] = mu_r
            col = np.repeat(b.astype(np.uint64), 2 * t)
            for w, row in enumerate(_words(col, q)):
                TCOL[k, :, 4 * s + w] = row
        # identity 2: A_s[r] == mu_r^{t_s} for every stage
        for s, t in enumerate(stages):
            m = n // (2 * t)
            gcn = _C // (2 * t)
            a = (
                plain[m : m + n1 * gcn : gcn].astype(object)
                * pow(int(plain[m]), -1, q)
                % q
            )
            assert (
                a == np.array([pow(int(x), t, q) for x in mu], dtype=object)
            ).all(), (t, limbs[k])

        # twist plane: TW[c, r] = mu_r^c (mod q), pre-multiplied before the
        # forward (CT) shared stages; the inverse (GS) direction's own
        # mu-tilde plane post-multiplies after its shared stages
        tw = np.ones((_C, n1), dtype=object)
        base = mu
        for c in range(1, _C):
            tw[c] = tw[c - 1] * base % q
        tw64 = tw.astype(np.uint64)
        sh = np.empty_like(tw64)
        for c in range(_C):
            sh[c] = _shoup_of(tw64[c], q)
        TTW[k, 0 * _C : 1 * _C] = (tw64 & 0xFFFFFFFF).astype(np.uint32)
        TTW[k, 1 * _C : 2 * _C] = (tw64 >> 32).astype(np.uint32)
        TTW[k, 2 * _C : 3 * _C] = (sh & 0xFFFFFFFF).astype(np.uint32)
        TTW[k, 3 * _C : 4 * _C] = (sh >> 32).astype(np.uint32)
    return TROW, TCOL, TTW


def _kernel(n1, inverse, consts_ref, xl, xh, trow, tcol, ttw, ol, oh):
    row_head, row_roll = _slice_roll_split(n1)
    col_head, col_roll = _slice_roll_split(_C)
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)

    x = (xl[0], xh[0])  # (n1, 128)
    TR = trow[0]
    TC = tcol[0]
    TW = ttw[0]

    if inverse:
        # callers may hand in lazily reduced values (< 4q); the GS
        # butterfly's U path needs < 2q operands
        x = _fold(_fold(x, two_q), two_q)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_C, 1), 0)

    def slice_pass(x, group, cols, rows_tot, tbl, tbl_col0):
        """Register part-slice butterflies over rows (pair-shared)."""
        t_slice = min(group)
        P = (max(group) * 2) // t_slice
        M = rows_tot // (P * t_slice)
        lanes_w = x[0].shape[-1]
        x4l = x[0].reshape(M, P, t_slice, lanes_w)
        x4h = x[1].reshape(M, P, t_slice, lanes_w)
        parts = [(x4l[:, b], x4h[:, b]) for b in range(P)]
        q3 = (q[0].reshape(1, 1, 1), q[1].reshape(1, 1, 1))
        two_q3 = (two_q[0].reshape(1, 1, 1), two_q[1].reshape(1, 1, 1))
        for j, sigma in zip(cols, group):
            d = sigma // t_slice
            TH = tbl[: rows_tot // 2]
            npair = P // 2
            c0 = tbl_col0 + 4 * j
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
                    pair = a * d + r
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
        lo = jnp.stack([p[0] for p in parts], axis=1).reshape(rows_tot, lanes_w)
        hi = jnp.stack([p[1] for p in parts], axis=1).reshape(rows_tot, lanes_w)
        return lo, hi

    def roll_stage(x, tr, size, iota, tbl, col):
        """Fixed-shift sublane-roll butterfly on axis 0."""
        f = (tbl[:, col + 0].reshape(size, 1), tbl[:, col + 1].reshape(size, 1))
        fs = (tbl[:, col + 2].reshape(size, 1), tbl[:, col + 3].reshape(size, 1))
        is_u = (iota % (2 * tr)) < tr
        rf = lambda a, d: (
            pltpu.roll(a[0], d % size, axis=0),
            pltpu.roll(a[1], d % size, axis=0),
        )
        if not inverse:
            folded = _fold(x, two_q)
            mont = modred.mul_shoup(x, f, fs, q)
            out_u = u.add64(folded, rf(mont, -tr))
            out_v = u.sub64(u.add64(rf(folded, tr), two_q), mont)
        else:
            out_u = _fold(u.add64(x, rf(x, -tr)), two_q)
            diff = u.sub64(u.add64(rf(x, tr), two_q), x)
            out_v = modred.mul_shoup(diff, f, fs, q)
        return u.select64(is_u, out_u, out_v)

    def twist(x):
        tw = (TW[0 * _C : 1 * _C], TW[1 * _C : 2 * _C])
        tws = (TW[2 * _C : 3 * _C], TW[3 * _C : 4 * _C])
        return modred.mul_shoup(x, tw, tws, q)

    T = lambda a: (jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2))
    rh_cols = list(range(len(row_head)))
    rr_off = 4 * len(row_head)

    col_stages_all = col_head + col_roll

    if not inverse:
        for g0 in range(0, len(row_head), 3):
            x = slice_pass(
                x, row_head[g0 : g0 + 3], rh_cols[g0 : g0 + 3], n1, TR, 0
            )
        for j, tr in enumerate(row_roll):
            x = roll_stage(x, tr, n1, row_iota, TR, rr_off + 4 * j)
        x = twist(T(x))
        for s, t in enumerate(col_stages_all):
            x = roll_stage(x, t, _C, col_iota, TC, 4 * s)
        u0 = _scal(consts_ref, 2)
        x = T(modred.bred_add(x, q, u0))
    else:
        x = T(x)
        for s in range(len(col_stages_all) - 1, -1, -1):
            x = roll_stage(x, col_stages_all[s], _C, col_iota, TC, 4 * s)
        x = T(twist(x))
        for j in range(len(row_roll) - 1, -1, -1):
            x = roll_stage(x, row_roll[j], n1, row_iota, TR, rr_off + 4 * j)
        rev = list(zip(rh_cols, row_head))[::-1]
        for g0 in range(0, len(rev), 3):
            chunk = rev[g0 : g0 + 3]
            x = slice_pass(
                x, [t for _, t in chunk], [c for c, _ in chunk], n1, TR, 0
            )
        ninv = _scal(consts_ref, 3)
        ninv_s = _scal(consts_ref, 4)
        x = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)

    ol[0] = x[0]
    oh[0] = x[1]


@functools.lru_cache(maxsize=None)
def _build_call(n, L, B, inverse, interpret):
    n1 = n // _C
    kernel = functools.partial(_kernel, n1, inverse)
    grid = (L * B,)
    limb = lambda i: (jax.lax.div(i, B), 0, 0)
    own = lambda i: (i, 0, 0)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 16), limb, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n1, _C), own, memory_space=vm),
            pl.BlockSpec((1, n1, _C), own, memory_space=vm),
            pl.BlockSpec((1, n1, _C), limb, memory_space=vm),
            pl.BlockSpec((1, _C, 32), limb, memory_space=vm),
            pl.BlockSpec((1, 4 * _C, n1), limb, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, n1, _C), own, memory_space=vm),
            pl.BlockSpec((1, n1, _C), own, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L * B, n1, _C), jnp.uint32),
            jax.ShapeDtypeStruct((L * B, n1, _C), jnp.uint32),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def ntt_tile(
    ring,
    x: U64,
    limbs: tuple[int, ...],
    inverse: bool = False,
    interpret: bool = False,
) -> U64:
    """Merged-psi (Inv)NTT of ``x`` [..., L, n], bit-exact vs the reference
    schedule, one pallas program per (batch, limb) row."""
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    n1 = n // _C
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1

    consts = table(
        f"{ring.key}/tileconsts/{tuple(limbs)}",
        lambda: _consts_table(ring, tuple(limbs)),
    )
    TROW, TCOL, TTW = table(
        f"{ring.key}/tiletw/{tuple(limbs)}/{int(inverse)}",
        lambda: _build_tables(ring, tuple(limbs), inverse),
    )

    def to_tiles(a):
        a = a.reshape(B, L, n1, _C)
        if B > 1:  # limb-major rows so consecutive programs share tables
            a = a.swapaxes(0, 1)
        return a.reshape(L * B, n1, _C)

    def from_tiles(a):
        a = a.reshape(L, B, n1, _C) if B > 1 else a.reshape(B, L, n1, _C)
        if B > 1:
            a = a.swapaxes(0, 1)
        return a.reshape(*batch, L, n)

    call = _build_call(n, L, B, inverse, interpret)
    ol, oh = call(consts, to_tiles(lo), to_tiles(hi), TROW, TCOL, TTW)
    return from_tiles(ol), from_tiles(oh)
