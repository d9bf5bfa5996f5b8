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
exists, and psi-premultiplication folded into MA / T.  The factorization is
bit-exact against the reference schedule (perf_lab/proto_fourstep.py).

Exact 60-bit modular matmuls ride the MXU as int8 digit products:

* matrices: for each input-digit position d, the folded matrix
  (M * 2^{8d} mod q) is decomposed into 8 *balanced* s8 digits e, stacked
  into one [(e,r), (d,j1)] (or [(d,j2), (e,c)]) s8 operand — so one
  s8 x s8 -> s32 matmul with contraction over (j, d) produces the 8 output
  digit planes of the true modular product, with every plane bounded by
  contraction * 128 * 255 < 2^28 (exact in s32).
* data: raw unsigned byte digits, shipped as s8 via the (u - 128) offset;
  the constant -128 * (matrix row/col sums) correction plus a +2^k
  positivity offset is folded into one broadcast add per matmul.
* plane recombination (VPU): V = sum_e plane_e 2^{8e} is rebuilt as a u64
  pair via one Shoup product with 2^40 mod q, multiplied by the mid twiddle
  T (another Shoup product, lazy [0,2q)), and re-digitized — no exact
  reduction anywhere except the single final BRedAdd, mirroring the
  reference's lazy-reduction discipline (ring/ntt.go:32-50).

Measured on v5e (perf_lab/lab10_mxu_shapes.py): the two matmuls sustain
183-404 T-MAC/s, putting the MXU work at ~0.35us per NTT-limb; the kernel
is VPU/HBM bound at roughly 1us, ~3x the butterfly schedule.
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

_N2 = 128  # lane-axis transform length (fixed: one MXU/VPU lane tile)
_DIG = 8   # 8-bit digits per 64-bit word
_MASK = np.uint64(0xFF)


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
def _tables(ring, limbs: tuple[int, ...], inverse: bool):
    """Per-limb device operands for one direction.

    Returns dict of stacked numpy arrays over limbs:
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


def _smem_c(ref, k):
    return (jnp.reshape(ref[0, 0, 2 * k], (1, 1)),
            jnp.reshape(ref[0, 0, 2 * k + 1], (1, 1)))


def _byte_digits(x: U64) -> list[jnp.ndarray]:
    """u64 pair -> 8 uint32 byte planes (digit d = bits [8d, 8d+8))."""
    lo, hi = x
    out = []
    for w in (lo, hi):
        out += [w & 255, (w >> 8) & 255, (w >> 16) & 255, (w >> 24) & 255]
    return out


def _as_i8(planes: list[jnp.ndarray], axis: int) -> jnp.ndarray:
    """Stack u8-valued u32 planes along ``axis`` as (u - 128) int8."""
    s = jnp.stack(planes, axis=axis)
    return (s.astype(jnp.int32) - 128).astype(jnp.int8)


def _combine_planes(planes: list[jnp.ndarray], consts_ref, q: U64) -> U64:
    """8 s32 digit planes (cast u32, each < 2^31) -> u64 value
    sum_e plane_e 2^{8e}, lazily reduced below 2^62 via one Shoup product
    with 2^40 mod q."""
    pl_u = [p.astype(jnp.uint32) for p in planes]
    lo_v: U64 = (pl_u[0], jnp.zeros_like(pl_u[0]))
    for e in range(1, 5):
        lo_v = u.add64(lo_v, u.shl64((pl_u[e], jnp.zeros_like(pl_u[e])), 8 * e))
    hi_v: U64 = (pl_u[5], jnp.zeros_like(pl_u[5]))
    for e in range(6, 8):
        hi_v = u.add64(hi_v, u.shl64((pl_u[e], jnp.zeros_like(pl_u[e])), 8 * (e - 5)))
    c40 = _smem_c(consts_ref, 1)
    c40s = _smem_c(consts_ref, 2)
    return u.add64(lo_v, modred.mul_shoup(hi_v, c40, c40s, q))


def _kernel(n1, inverse, consts_ref, xl, xh, m_rows, c_rows, ttab, m_lanes,
            c_lanes, ol, oh):
    q = _smem_c(consts_ref, 0)
    P = xl.shape[0]
    x = (xl[:, 0], xh[:, 0])  # [P, n1, 128]

    def rows_matmul(data: U64):
        """contract (d, j) over rows: [DIG*n1, DIG*n1] @ [DIG*n1, P*128]."""
        t = (jnp.transpose(data[0], (1, 0, 2)), jnp.transpose(data[1], (1, 0, 2)))
        planes = _byte_digits(t)  # 8 x [n1, P, 128]
        d1 = _as_i8(planes, axis=0).reshape(_DIG * n1, P * _N2)
        o = jax.lax.dot_general(m_rows[0], d1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = o + c_rows[0]
        return [o[e * n1:(e + 1) * n1] for e in range(_DIG)]  # [n1, P*128] each

    def lanes_matmul(data: U64):
        """contract (d, j) over lanes: [P*n1, DIG*128] @ [DIG*128, DIG*128]."""
        planes = _byte_digits(data)  # 8 x [P, n1, 128]
        d2 = _as_i8(planes, axis=2).reshape(P * n1, _DIG * _N2)
        o = jax.lax.dot_general(d2, m_lanes[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = o + c_lanes[0]
        return [o[:, e * _N2:(e + 1) * _N2] for e in range(_DIG)]  # [P*n1, 128]

    def twiddle(v: U64, shape3) -> U64:
        # broadcast the [n1, 128] twiddle planes over the poly axis of
        # [n1, P, 128] (forward) or [P, n1, 128] (inverse)
        vv = (v[0].reshape(shape3), v[1].reshape(shape3))
        sl = (slice(None), None) if shape3[0] == n1 else (None,)
        tw = (ttab[0, 0][sl], ttab[0, 1][sl])
        tsh = (ttab[0, 2][sl], ttab[0, 3][sl])
        tco = (ttab[0, 4][sl], ttab[0, 5][sl])
        return u.add64(modred.mul_shoup(vv, tw, tsh, q), tco)

    def finalize(planes) -> U64:
        v = _combine_planes(planes, consts_ref, q)
        cf = _smem_c(consts_ref, 3)
        u0 = _smem_c(consts_ref, 4)
        return modred.bred_add(u.add64(v, cf), q, u0)

    if not inverse:
        mid = rows_matmul(x)  # 8 planes [n1, P*128]
        v = _combine_planes(mid, consts_ref, q)
        y = twiddle(v, (n1, P, _N2))  # [n1, P, 128]
        y = (jnp.transpose(y[0], (1, 0, 2)), jnp.transpose(y[1], (1, 0, 2)))
        fin = lanes_matmul(y)  # 8 planes [P*n1, 128]
        out = finalize(fin)
        ol[:, 0] = out[0].reshape(P, n1, _N2)
        oh[:, 0] = out[1].reshape(P, n1, _N2)
    else:
        mid = lanes_matmul(x)  # 8 planes [P*n1, 128]
        v = _combine_planes(mid, consts_ref, q)
        y = twiddle(v, (P, n1, _N2))  # [P, n1, 128]
        fin = rows_matmul(y)  # 8 planes [n1, P*128]
        out = finalize(fin)
        lo = jnp.transpose(out[0].reshape(n1, P, _N2), (1, 0, 2))
        hi = jnp.transpose(out[1].reshape(n1, P, _N2), (1, 0, 2))
        ol[:, 0] = lo
        oh[:, 0] = hi


@functools.lru_cache(maxsize=None)
def _build_call(n1, n_limbs, n_blocks, P, inverse, interpret):
    kernel = functools.partial(_kernel, n1, inverse)
    grid = (n_limbs, n_blocks)
    vm = pltpu.VMEM
    dn1 = _DIG * n1
    dn2 = _DIG * _N2
    limb = lambda l, b: (l, 0, 0)
    limb4 = lambda l, b: (l, 0, 0, 0)
    blk = lambda l, b: (b, l, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def ntt_mxu(ring, x: U64, limbs: tuple[int, ...], inverse: bool = False,
            interpret: bool = False, block_polys: int = 8) -> U64:
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

    call = _build_call(n1, L, nb, P, inverse, interpret)
    olo, ohi = call(t["consts"], shape_in(lo), shape_in(hi), t["m_rows"],
                    t["c_rows"], t["ttab"], t["m_lanes"], t["c_lanes"])
    olo = olo[:B].reshape(*batch, L, n)
    ohi = ohi[:B].reshape(*batch, L, n)
    return olo, ohi
