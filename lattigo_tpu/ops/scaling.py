"""RNS rescaling (divide by last modulus) and BFV t/Q scaled reconstruction.

TPU-native counterpart of ring/ring_scaling.go.  The reference's
``SimpleScaler`` accumulates the fractional part in Float128 double-double
arithmetic (ring/float128.go); TPUs have no fast f64/f128, so the fraction is
computed here with exact integer arithmetic: per-limb exact division via
Montgomery inverse words plus a 58-bit fixed-point rounding term.  This is
strictly more precise than the reference's double-double path (exact integer
vs ~2^-40 absolute float error), so outputs agree wherever the reference is
correct.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lattigo_tpu.ops import modred, number_theory as nt
from lattigo_tpu.ops import u64 as u

U64 = u.U64
_F = 58  # fixed-point fractional bits for the rounding term


def _pairs(vals, shape):
    return u.from_u64(np.array(vals, dtype=np.uint64).reshape(shape))


def _last(x: U64) -> U64:
    return x[0][..., -1:, :], x[1][..., -1:, :]


def _head(x: U64) -> U64:
    return x[0][..., :-1, :], x[1][..., :-1, :]


def _rescale_tbl(ring, lvl: int) -> U64:
    return _pairs(ring.rescale_params[lvl - 1], (lvl, 1))


def div_floor_by_last_modulus(ring, x: U64) -> U64:
    """floor(x / q_last) per remaining limb, coefficient domain
    (ring/ring_scaling.go:37-55).  Returns one fewer limb."""
    lvl = ring.level_of(x)
    head, last = _head(x), _last(x)
    q = ring._c(ring.q_, lvl - 1)
    qinv = ring._c(ring.qinv_, lvl - 1)
    u0 = ring._c(ring.u0_, lvl - 1)
    last_mod_qi = modred.bred_add(last, q, u0)
    num = u.add64(head, u.sub64(q, last_mod_qi))
    return modred.mred(num, _rescale_tbl(ring, lvl), q, qinv)


def div_floor_by_last_modulus_ntt(ring, x: U64) -> U64:
    """Same, NTT-domain in/out: only the dropped limb leaves the NTT domain
    (ring/ring_scaling.go:9-34)."""
    lvl = ring.level_of(x)
    head, last = _head(x), _last(x)
    last_coeff = ring.intt_limbs(last, (lvl,))
    rep = _bcast_limb(last_coeff, lvl)
    tmp = ring.ntt_limbs(rep, tuple(range(lvl)))
    q = ring._c(ring.q_, lvl - 1)
    qinv = ring._c(ring.qinv_, lvl - 1)
    num = u.add64(head, u.sub64(q, tmp))
    return modred.mred(num, _rescale_tbl(ring, lvl), q, qinv)


def div_round_by_last_modulus(ring, x: U64) -> U64:
    """round(x / q_last) (ring/ring_scaling.go:117-149)."""
    lvl = ring.level_of(x)
    q_last = ring.moduli[lvl]
    p_half = (q_last - 1) >> 1
    head, last = _head(x), _last(x)
    last = modred.cred(
        u.add64(last, u.const64(p_half, (1, 1))), _pairs([q_last], (1, 1))
    )
    q = ring._c(ring.q_, lvl - 1)
    qinv = ring._c(ring.qinv_, lvl - 1)
    u0 = ring._c(ring.u0_, lvl - 1)
    p_half_neg = _pairs(
        [qi - p_half % qi for qi in ring.moduli[:lvl]], (lvl, 1)
    )
    shifted = modred.bred_add(u.add64(last, p_half_neg), q, u0)
    num = u.add64(head, u.sub64(q, shifted))
    return modred.mred(num, _rescale_tbl(ring, lvl), q, qinv)


def div_round_by_last_modulus_ntt(ring, x: U64) -> U64:
    """round(x / q_last), NTT-domain in/out (ring/ring_scaling.go:72-114)."""
    lvl = ring.level_of(x)
    q_last = ring.moduli[lvl]
    p_half = (q_last - 1) >> 1
    head, last = _head(x), _last(x)
    last_coeff = ring.intt_limbs(last, (lvl,))
    last_coeff = modred.cred(
        u.add64(last_coeff, u.const64(p_half, (1, 1))), _pairs([q_last], (1, 1))
    )
    p_half_neg = _pairs(
        [qi - p_half % qi for qi in ring.moduli[:lvl]], (lvl, 1)
    )
    rep = _bcast_limb(last_coeff, lvl)
    shifted = u.add64(rep, p_half_neg)
    tmp = ring.ntt_limbs(shifted, tuple(range(lvl)))
    q = ring._c(ring.q_, lvl - 1)
    qinv = ring._c(ring.qinv_, lvl - 1)
    num = u.add64(head, u.sub64(q, tmp))
    return modred.mred(num, _rescale_tbl(ring, lvl), q, qinv)


def div_floor_by_last_modulus_many(ring, x: U64, nb: int) -> U64:
    for _ in range(nb):
        x = div_floor_by_last_modulus(ring, x)
    return x


def div_round_by_last_modulus_many(ring, x: U64, nb: int) -> U64:
    for _ in range(nb):
        x = div_round_by_last_modulus(ring, x)
    return x


def _bcast_limb(limb: U64, count: int) -> U64:
    lo, hi = limb
    shp = (*lo.shape[:-2], count, lo.shape[-1])
    return jnp.broadcast_to(lo, shp), jnp.broadcast_to(hi, shp)


class SimpleScaler:
    """Exact CRT reconstruction scaled by t/Q, mod t
    (ring/ring_scaling.go:168-300, HPS'18).

    result(x) = round( t/Q * CRT(x) ) mod t, computed limb-wise as
    sum_j [ x_j*w_j + floor(x_j*c_j/q_j) ] + round(sum_j (x_j*c_j mod q_j)/q_j)
    where w_j = floor((Q/q_j)^-1 * t / q_j) and c_j = ((Q/q_j)^-1 * t) mod q_j.
    Every term is exact integer arithmetic (see module docstring).
    """

    def __init__(self, t: int, ring):
        self.t = int(t)
        self.ring = ring
        self.t_pow2 = (t & (t - 1)) == 0
        L = ring.L
        ws, cs, m_lo, m_hi = [], [], [], []
        for q in ring.moduli:
            q_star = ring.modulus_bigint // q
            q_barre = pow(q_star, -1, q)
            w = q_barre * t // q
            c = q_barre * t % q
            if not self.t_pow2:
                w = nt.mform(w % t, t)
            ws.append(w % (1 << 64))
            cs.append(c)
            # M_j = floor(2^(64+F)/q_j), applied to r_j = (x_j*c_j mod q_j)
            # at runtime to accumulate the fixed-point fraction r_j/q_j.
            m = (1 << (64 + _F)) // q
            m_lo.append(m & nt.MASK64)
            m_hi.append(m >> 64)
        self.w_ = _pairs(ws, (L, 1))
        self.c_ = _pairs(cs, (L, 1))
        self.m_lo_ = _pairs(m_lo, (L, 1))
        self.m_hi_ = _pairs(m_hi, (L, 1))
        if not self.t_pow2:
            # host pairs, NOT jnp constants: scalers are built lazily and may
            # be constructed inside a trace — caching tracers would leak
            tb = nt.bred_params(t)
            self.t_ = _pairs([t], (1, 1))
            self.t_u0_ = _pairs([tb[0]], (1, 1))
            self.t_u1_ = _pairs([tb[1]], (1, 1))
            self.tinv_ = _pairs([nt.mred_params(t)], (1, 1))

    def _mul_mod_t(self, a: U64, b: U64) -> U64:
        if self.t_pow2:
            lo, hi = u.mullo64(a, b)
            mask = self.t - 1
            return lo & np.uint32(mask & 0xFFFFFFFF), hi & np.uint32(mask >> 32)
        return modred.mred(a, b, self.t_, self.tinv_)

    def _red_t(self, a: U64) -> U64:
        if self.t_pow2:
            mask = self.t - 1
            return a[0] & np.uint32(mask & 0xFFFFFFFF), a[1] & np.uint32(mask >> 32)
        return modred.bred_add(a, self.t_, self.t_u0_)

    def scale(self, x: U64, out_limbs: int) -> U64:
        """x: [..., L, N] basis Q -> [..., out_limbs, N], every limb holding
        round(t/Q * CRT(x)) mod t."""
        ring = self.ring
        L = x[0].shape[-2]
        q = ring._c(ring.q_, L - 1)
        qinv = ring._c(ring.qinv_, L - 1)
        u0 = ring._c(ring.u0_, L - 1)
        u1 = ring._c(ring.u1_, L - 1)

        w = (self.w_[0][:L], self.w_[1][:L])
        c = (self.c_[0][:L], self.c_[1][:L])
        m_lo = (self.m_lo_[0][:L], self.m_lo_[1][:L])
        m_hi = (self.m_hi_[0][:L], self.m_hi_[1][:L])

        # integer parts: x_j*w_j mod t  and  d_j = floor(x_j*c_j/q_j) mod t
        a = self._mul_mod_t(w, x)  # [..., L, N], < t
        r = modred.bred(x, c, q, u0, u1)  # (x_j*c_j) mod q_j
        prod_lo = u.mullo64(x, c)
        d = u.mullo64(u.sub64(prod_lo, r), qinv)  # exact quotient < 2^61
        d = self._red_t(d)

        # rounding term: round(sum_j r_j / q_j) via 58-bit fixed point
        def limb(tt, i):
            return tt[0][..., i : i + 1, :], tt[1][..., i : i + 1, :]

        acc_int = None
        vacc = None
        pending = 0
        for i in range(L):
            term = u.add64(limb(a, i), limb(d, i))
            acc_int = term if acc_int is None else u.add64(acc_int, term)
            pending += 2
            if pending >= 6:
                acc_int = self._red_t(acc_int)
                pending = 1
            ri = limb(r, i)
            ti = u.add64(
                u.mulhi64(ri, limb(m_lo, i)), u.mullo64(ri, limb(m_hi, i))
            )
            vacc = ti if vacc is None else u.add64(vacc, ti)
        v = u.shr64(u.add64(vacc, u.const64(1 << (_F - 1), (1, 1))), _F)
        out = self._red_t(u.add64(acc_int, v))
        return _bcast_limb(out, out_limbs)
