"""Four-step negacyclic NTT on the MXU with exact s8xs8->s32 digit matmuls.

The reference transform (ring/ntt.go:53-139, Cooley-Tukey DIT over the
bit-reversed merged-psi tables) is an O(N log N) butterfly network whose
exact u32-pair Shoup arithmetic ceilings the v5e VPU at ~300k NTT/s
(PERF_NOTES.md).  This kernel instead evaluates the same linear map as two
modular matrix products (the classic four-step / Bailey factorization,
N = n1 x 128):

  out2d[r, c] = ( (MA @ x2d) * T ) @ MB   (mod q),   x2d[j1, j2]

with the reference's bit-reversed output order baked into MA's rows
(k1 = rev(r)) and MB's columns (k2 = rev(c)) so no runtime permutation
exists, and psi-premultiplication folded into MA / T.  Forward is
sublane-transform-first, inverse lane-first — the twiddle's (k1, j2)
coupling forces that order (see the derivation in perf_lab/lab15 notes).

Exact 60-bit modular matmuls ride the MXU as int8 digit products:

* matrices: for each input-digit position d, the folded matrix
  (M * 2^{8d} mod q) is decomposed into 8 *balanced* s8 digits e, stacked
  into one [(e,r), (d,j1)] (or [(d,j2), (e,c)]) s8 operand — so one
  s8 x s8 -> s32 matmul with contraction over (j, d) produces the 8 output
  digit planes of the true modular product, every plane < 2^31 (exact s32).
* data: unsigned byte digits shipped as (u ^ 0x80) - 128 int8; the
  constant -128 * (matrix row/col sums) correction plus a +2^k positivity
  offset is folded into one broadcast add per matmul.
* digitizations are relayout-free: the sublane-side operand is built by
  astype(i8) packs concatenated on the sublane axis (digit-major matching
  the matrix layout), the lane-side by lane-axis concatenation — no
  (batch, lane) merges and no interleaving stacks (the round-3 kernel's
  Mosaic relayouts, ~2x of its runtime).
* plane recombination (VPU): V = sum_e plane_e 2^{8e} rebuilt as a u64
  pair via one Shoup product with 2^40 mod q, multiplied by the mid
  twiddle T (another Shoup, lazy [0,2q)), and re-digitized — one exact
  BRedAdd at the very end, mirroring the reference's lazy-reduction
  discipline (ring/ntt.go:32-50).

On hardware the per-(limb, block) compute runs inside an explicit
3-deep manual DMA ring (make_async_copy ping-pong over an ANY-space HBM
ref): block k+1.. streams in while block j computes and block j-1 drains.
Measured on the v5e bench chip (perf_lab/lab18, chain=100 digest-forced):
550k NTT/s at the headline shape (N=8192, 60-bit, B=1024, L=2) vs 255k
for the 3-pass butterfly kernel — compute-bound in the u64 combine/
twiddle/reduce glue (MXU time ~0.5 us/limb-NTT of the 1.8 us total).

Tables are tjit-managed device arguments (lattigo_tpu/tjit.py), so
compiled pipelines receive them as runtime operands, not HLO constants.
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
from lattigo_tpu.tjit import content_key, table

U64 = u.U64

_N2 = 128  # lane-axis transform length (fixed: one MXU/VPU lane tile)
_DIG = 8   # 8-bit digits per 64-bit word
_XOR = np.uint32(0x80)


def supported(n: int) -> bool:
    n1 = n // _N2
    return n % _N2 == 0 and 32 <= n1 <= 256 and n1 & (n1 - 1) == 0


def _bitrev(i: int, bits: int) -> int:
    return int(bin(i + (1 << bits))[3:][::-1], 2) if bits else 0


def _balanced_digits(m: np.ndarray) -> np.ndarray:
    """[..., a, b] int64 (< 2^60) -> [_DIG, ..., a, b] int8 balanced digits."""
    v = m.astype(np.int64).copy()
    planes = []
    for _ in range(_DIG):
        d = v & 255
        d -= 256 * (d >= 128)
        planes.append(d.astype(np.int8))
        v = (v - d) >> 8
    assert int(np.abs(v).max(initial=0)) == 0
    return np.stack(planes, axis=0)


def _digit_matrix(m: np.ndarray, q: int, contract_first: bool) -> tuple[np.ndarray, np.ndarray, int]:
    """Fold per-digit scale into a modular matrix and digit-decompose it.

    m: [a, b] object/int array of values mod q; the matmul contracts axis 0
    of the returned operand when ``contract_first`` (lanes-side matmul
    data @ M), else axis 1 (rows-side matmul M @ data).

    Returns (s8 operand [(d,a),(e,b)] or [(e,a),(d,b)], s32 correction for
    the (u8 - 128) data offset plus a positivity offset, the offset OFF).
    """
    a, b = m.shape
    mo = m.astype(object)
    folded = np.empty((_DIG, a, b), dtype=np.int64)
    for d in range(_DIG):
        folded[d] = ((mo * pow(1 << (8 * d), 1, q)) % q).astype(np.int64)
    dig = _balanced_digits(folded)  # [e, d, a, b]
    contraction = _DIG * (a if contract_first else b)
    off = 1 << int(contraction * 128 * 255).bit_length()
    if contract_first:
        # operand [(d, a), (e, b)]; correction per output column (e, b)
        op = dig.transpose(1, 2, 0, 3).reshape(_DIG * a, _DIG * b)
        corr = 128 * op.astype(np.int64).sum(axis=0) + off
        corr = corr.reshape(1, _DIG * b)
    else:
        # operand [(e, a), (d, b)]; correction per output row (e, a)
        op = dig.transpose(0, 2, 1, 3).reshape(_DIG * a, _DIG * b)
        corr = 128 * op.astype(np.int64).sum(axis=1) + off
        corr = corr.reshape(_DIG * a, 1)
    assert int(corr.max()) < 2**31 and int(corr.min()) >= 0
    return op, corr.astype(np.int32), off


def _u64_words(v: int) -> tuple[np.uint32, np.uint32]:
    return np.uint32(v & 0xFFFFFFFF), np.uint32((v >> 32) & 0xFFFFFFFF)


@functools.lru_cache(maxsize=None)
def _tables_host(ring, limbs: tuple[int, ...], inverse: bool):
    """Per-limb operands for one direction (host numpy).

    Returns dict of stacked arrays over limbs:
      m_rows  [L, DIG*n1, DIG*n1] s8   rows-side matrix (fwd MA / inv MH)
      c_rows  [L, DIG*n1, 1]      s32
      m_lanes [L, DIG*128, DIG*128] s8 lanes-side matrix (fwd MB / inv MG)
      c_lanes [L, 1, DIG*128]     s32
      ttab    [L, 6, n1, 128]     u32  twiddle plain/shoup/corr lo-hi planes
      consts  [L, 1, 16]          u32  q, c40, c40_shoup, Cf, bred u0 (lo,hi)
    """
    n = ring.n
    n1 = n // _N2
    b1, b2 = n1.bit_length() - 1, _N2.bit_length() - 1
    L = len(limbs)
    m_rows = np.empty((L, _DIG * n1, _DIG * n1), dtype=np.int8)
    c_rows = np.empty((L, _DIG * n1, 1), dtype=np.int32)
    m_lanes = np.empty((L, _DIG * _N2, _DIG * _N2), dtype=np.int8)
    c_lanes = np.empty((L, 1, _DIG * _N2), dtype=np.int32)
    ttab = np.empty((L, 6, n1, _N2), dtype=np.uint32)
    consts = np.zeros((L, 1, 16), dtype=np.uint32)

    rev1 = [_bitrev(r, b1) for r in range(n1)]
    rev2 = [_bitrev(c, b2) for c in range(_N2)]
    j1v = np.arange(n1, dtype=object)
    j2v = np.arange(_N2, dtype=object)

    for li, l in enumerate(limbs):
        q = ring.moduli[l]
        # psi power lookup (order 2N)
        psi_m = int(ring.psi_mont[l]) * pow(1 << 64, -1, q) % q
        pows = np.empty(2 * n, dtype=object)
        cur = 1
        for i in range(2 * n):
            pows[i] = cur
            cur = cur * psi_m % q
        twon = 2 * n

        k1 = np.array(rev1, dtype=object)[:, None]
        k2 = np.array(rev2, dtype=object)[None, :]
        ix = lambda e: pows[(e % twon).astype(np.int64)]
        if not inverse:
            # MA[r, j1] = psi^{n2 j1 (2 k1 + 1)}; T[r, j2] = psi^{j2 (2 k1 + 1)}
            # MB[j2, c] = psi^{2 n1 j2 k2}
            mr = ix(_N2 * j1v[None, :] * (2 * k1 + 1))
            tw = ix(j2v[None, :] * (2 * k1 + 1))
            ml = ix(2 * n1 * j2v[:, None] * k2)  # [j2, c]
        else:
            # MG[c, j2] = psi^{-2 n1 k2 j2}; T'[r, j2] = psi^{-j2 (2 k1 + 1)}
            # MH[j1, r] = N^-1 psi^{-n2 j1 (2 k1 + 1)}
            ninv = pow(n, -1, q)
            ml = ix(-2 * n1 * k2.T * j2v[None, :])  # [c, j2]
            tw = ix(-j2v[None, :] * (2 * k1 + 1))
            mr = (ninv * ix(-_N2 * j1v[:, None] * (2 * k1.T + 1))) % q  # [j1, r]

        op_r, corr_r, off_r = _digit_matrix(mr, q, contract_first=False)
        op_l, corr_l, off_l = _digit_matrix(ml, q, contract_first=True)
        m_rows[li], c_rows[li] = op_r, corr_r
        m_lanes[li], c_lanes[li] = op_l, corr_l

        # mid/final offsets: fwd mid consumes the rows-matmul planes, the
        # final the lanes-matmul planes; inverse is mirrored.
        off_mid, off_fin = (off_r, off_l) if not inverse else (off_l, off_r)
        ones = ((1 << 64) - 1) // 255  # 0x0101010101010101
        k_mid = off_mid * ones
        k_fin = off_fin * ones
        cf = (-k_fin) % q

        tw64 = tw.astype(object)
        tsh = np.empty_like(tw64)
        tcorr = np.empty_like(tw64)
        for idx in np.ndindex(tw64.shape):
            t = int(tw64[idx])
            tsh[idx] = (t << 64) // q
            tcorr[idx] = (-t * k_mid) % q
        for j, arr in enumerate((tw64, tsh, tcorr)):
            a64 = arr.astype(np.uint64)
            ttab[li, 2 * j] = (a64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            ttab[li, 2 * j + 1] = (a64 >> np.uint64(32)).astype(np.uint32)

        c40 = pow(1 << 40, 1, q)
        vals = [q, c40, (c40 << 64) // q, cf, ring.bred[l][0]]
        for j, v in enumerate(vals):
            consts[li, 0, 2 * j], consts[li, 0, 2 * j + 1] = _u64_words(v)

    return dict(m_rows=m_rows, c_rows=c_rows, m_lanes=m_lanes,
                c_lanes=c_lanes, ttab=ttab, consts=consts)


def _tables(ring, limbs: tuple[int, ...], inverse: bool):
    """tjit-registered tables: device arguments inside tjit programs."""
    name = f"mxuntt/{ring.key}/{content_key(limbs, inverse)}"
    return table(name, lambda: _tables_host(ring, limbs, inverse))


def _smem_c(ref, k):
    return (jnp.reshape(ref[0, 0, 2 * k], (1, 1)),
            jnp.reshape(ref[0, 0, 2 * k + 1], (1, 1)))


# ---------------------------------------------------------------------------
# kernel compute (shared by the grid and manual-ring drivers)
# ---------------------------------------------------------------------------


def _digitize_sublane(x3: U64, n1: int) -> jnp.ndarray:
    """[P, n1, 128] u64-pair -> [P, 8*n1, 128] i8, rows (d-major, j1)."""
    planes = []
    for w in x3:  # lo, hi words
        for e in range(4):
            planes.append((((w >> (8 * e)) & 255) ^ _XOR).astype(jnp.int8))
    return jnp.concatenate(planes, axis=1)


def _digitize_lane(x3: U64) -> jnp.ndarray:
    """[P, n1, 128] u64-pair -> [P, n1, 8*128] i8, cols (d-major, j2)."""
    planes = []
    for w in x3:
        for e in range(4):
            planes.append((((w >> (8 * e)) & 255) ^ _XOR).astype(jnp.int8))
    return jnp.concatenate(planes, axis=2)


def _combine3(planes, consts_ref, q) -> U64:
    """8 s32 [P, n1, 128] digit planes -> u64 pair sum_e plane_e 2^{8e},
    lazily reduced below 2^62 via one Shoup product with 2^40 mod q."""
    pl_u = [p.astype(jnp.uint32) for p in planes]
    z = jnp.zeros_like(pl_u[0])
    lo_v: U64 = (pl_u[0], z)
    for e in range(1, 5):
        lo_v = u.add64(lo_v, u.shl64((pl_u[e], z), 8 * e))
    hi_v: U64 = (pl_u[5], z)
    for e in range(6, 8):
        hi_v = u.add64(hi_v, u.shl64((pl_u[e], z), 8 * (e - 5)))
    c40 = _smem_c(consts_ref, 1)
    c40s = _smem_c(consts_ref, 2)
    return u.add64(lo_v, modred.mul_shoup(hi_v, c40, c40s, q))


def _compute_block(n1, P, inverse, consts_ref, m_rows, c_rows, ttab, m_lanes,
                   c_lanes, x: U64) -> U64:
    """One [P, n1, 128] block through the full four-step transform."""
    q = _smem_c(consts_ref, 0)

    def rows_mm(data3):
        # matrix-on-left, contraction (d, j1) on sublanes, one dot per poly
        d = _digitize_sublane(data3, n1)
        outs = []
        for p in range(P):
            o = jax.lax.dot_general(m_rows[0], d[p], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            outs.append(o + c_rows[0])
        st = jnp.stack(outs, axis=0)  # [P, 8*n1, 128]
        return [st[:, e * n1:(e + 1) * n1, :] for e in range(_DIG)]

    def lanes_mm(data3):
        # data-on-left, contraction (d, j2) on lanes
        d = _digitize_lane(data3).reshape(P * n1, _DIG * _N2)
        o = jax.lax.dot_general(d, m_lanes[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = (o + c_lanes[0]).reshape(P, n1, _DIG * _N2)
        return [o[:, :, e * _N2:(e + 1) * _N2] for e in range(_DIG)]

    def twiddle(v):
        tw = (ttab[0, 0][None], ttab[0, 1][None])
        tsh = (ttab[0, 2][None], ttab[0, 3][None])
        tco = (ttab[0, 4][None], ttab[0, 5][None])
        return u.add64(modred.mul_shoup(v, tw, tsh, q), tco)

    def finalize(planes):
        v = _combine3(planes, consts_ref, q)
        cf = _smem_c(consts_ref, 3)
        u0 = _smem_c(consts_ref, 4)
        return modred.bred_add(u.add64(v, cf), q, u0)

    if not inverse:
        mid = rows_mm(x)
        y = twiddle(_combine3(mid, consts_ref, q))
        return finalize(lanes_mm(y))
    mid = lanes_mm(x)
    y = twiddle(_combine3(mid, consts_ref, q))
    return finalize(rows_mm(y))


# ---------------------------------------------------------------------------
# driver 1: auto-pipelined grid (interpret mode / CPU correctness twin)
# ---------------------------------------------------------------------------


def _kernel_grid(n1, P, inverse, consts_ref, xl, xh, m_rows, c_rows, ttab,
                 m_lanes, c_lanes, ol, oh):
    out = _compute_block(n1, P, inverse, consts_ref, m_rows, c_rows, ttab,
                         m_lanes, c_lanes, (xl[:, 0], xh[:, 0]))
    ol[:, 0] = out[0]
    oh[:, 0] = out[1]


@functools.lru_cache(maxsize=None)
def _build_call_grid(n1, n_limbs, n_blocks, P, inverse, interpret):
    kernel = functools.partial(_kernel_grid, n1, P, inverse)
    vm = pltpu.VMEM
    dn1 = _DIG * n1
    dn2 = _DIG * _N2
    limb = lambda l, b: (l, 0, 0)
    limb4 = lambda l, b: (l, 0, 0, 0)
    blk = lambda l, b: (b, l, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_limbs, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda l, b: (l, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, 1, n1, _N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, _N2), blk, memory_space=vm),
            pl.BlockSpec((1, dn1, dn1), limb, memory_space=vm),
            pl.BlockSpec((1, dn1, 1), limb, memory_space=vm),
            pl.BlockSpec((1, 6, n1, _N2), limb4, memory_space=vm),
            pl.BlockSpec((1, dn2, dn2), limb, memory_space=vm),
            pl.BlockSpec((1, 1, dn2), limb, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((P, 1, n1, _N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, _N2), blk, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P * n_blocks, n_limbs, n1, _N2), jnp.uint32),
            jax.ShapeDtypeStruct((P * n_blocks, n_limbs, n1, _N2), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# driver 2: manual async-DMA ring (hardware path)
# ---------------------------------------------------------------------------


def _kernel_ring(n1, P, nb, depth, inverse, consts_ref, m_rows, c_rows, ttab,
                 m_lanes, c_lanes, xl, xh, ol, oh, bil, bih, bol, boh, sin,
                 sout):
    l = pl.program_id(0)

    def in_copy(b, slot, w):
        src, dst = (xl, bil) if w == 0 else (xh, bih)
        return pltpu.make_async_copy(
            src.at[pl.ds(b * P, P), l], dst.at[slot], sin.at[slot, w])

    def out_copy(b, slot, w):
        src, dst = (bol, ol) if w == 0 else (boh, oh)
        return pltpu.make_async_copy(
            src.at[slot], dst.at[pl.ds(b * P, P), l], sout.at[slot, w])

    def body(k, _):
        slot = jax.lax.rem(k, depth)

        @pl.when(k < nb)
        def _fetch():
            in_copy(k, slot, 0).start()
            in_copy(k, slot, 1).start()

        j = k - (depth - 1)

        @pl.when(jnp.logical_and(j >= 0, j < nb))
        def _work():
            slot_j = jax.lax.rem(j, depth)
            in_copy(j, slot_j, 0).wait()
            in_copy(j, slot_j, 1).wait()
            out = _compute_block(n1, P, inverse, consts_ref, m_rows, c_rows,
                                 ttab, m_lanes, c_lanes, (bil[slot_j], bih[slot_j]))

            @pl.when(j >= depth)
            def _wout():
                out_copy(j - depth, slot_j, 0).wait()
                out_copy(j - depth, slot_j, 1).wait()

            bol[slot_j] = out[0]
            boh[slot_j] = out[1]
            out_copy(j, slot_j, 0).start()
            out_copy(j, slot_j, 1).start()

        return 0

    jax.lax.fori_loop(0, nb + depth - 1, body, 0)

    def drain(j, _):
        slot_j = jax.lax.rem(j, depth)
        out_copy(j, slot_j, 0).wait()
        out_copy(j, slot_j, 1).wait()
        return 0

    jax.lax.fori_loop(max(0, nb - depth), nb, drain, 0)


@functools.lru_cache(maxsize=None)
def _build_call_ring(n1, n_limbs, nb, P, depth, inverse):
    kernel = functools.partial(_kernel_ring, n1, P, nb, depth, inverse)
    vm = pltpu.VMEM
    dn1 = _DIG * n1
    dn2 = _DIG * _N2
    limb = lambda l: (l, 0, 0)
    limb4 = lambda l: (l, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_limbs,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda l: (l, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dn1, dn1), limb, memory_space=vm),
            pl.BlockSpec((1, dn1, 1), limb, memory_space=vm),
            pl.BlockSpec((1, 6, n1, _N2), limb4, memory_space=vm),
            pl.BlockSpec((1, dn2, dn2), limb, memory_space=vm),
            pl.BlockSpec((1, 1, dn2), limb, memory_space=vm),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P * nb, n_limbs, n1, _N2), jnp.uint32),
            jax.ShapeDtypeStruct((P * nb, n_limbs, n1, _N2), jnp.uint32),
        ],
        scratch_shapes=[
            vm((depth, P, n1, _N2), jnp.uint32),
            vm((depth, P, n1, _N2), jnp.uint32),
            vm((depth, P, n1, _N2), jnp.uint32),
            vm((depth, P, n1, _N2), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )


def ntt_mxu(ring, x: U64, limbs: tuple[int, ...], inverse: bool = False,
            interpret: bool = False, block_polys: int = 16,
            depth: int = 3) -> U64:
    """Four-step MXU NTT/InvNTT over the carried limbs; bit-exact vs the
    reference schedule, accepts lazily reduced inputs (any value < 2^62)."""
    if not supported(ring.n):
        raise ValueError(f"n={ring.n} not supported by the MXU four-step NTT")
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    n1 = n // _N2
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    P = min(block_polys, max(1, B))
    pad = (-B) % P
    nb = (B + pad) // P

    t = _tables(ring, tuple(limbs), inverse)

    def shape_in(a):
        a = a.reshape(B, L, n1, _N2)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, L, n1, _N2), dtype=a.dtype)], axis=0)
        return a

    if interpret:
        call = _build_call_grid(n1, L, nb, P, inverse, True)
        olo, ohi = call(t["consts"], shape_in(lo), shape_in(hi), t["m_rows"],
                        t["c_rows"], t["ttab"], t["m_lanes"], t["c_lanes"])
    else:
        call = _build_call_ring(n1, L, nb, P, depth, inverse)
        olo, ohi = call(t["consts"], t["m_rows"], t["c_rows"], t["ttab"],
                        t["m_lanes"], t["c_lanes"], shape_in(lo), shape_in(hi))
    olo = olo[:B].reshape(*batch, L, n)
    ohi = ohi[:B].reshape(*batch, L, n)
    return olo, ohi
