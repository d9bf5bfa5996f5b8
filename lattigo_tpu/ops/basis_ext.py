"""RNS basis extension (HPS'18 fast base conversion) and CRT decomposition.

TPU-native counterpart of ring/ring_basis_extension.go.  The reference
computes the correction multiple ``v = floor(sum_i y_i / q_i)`` with float64
accumulation (ring/ring_basis_extension.go:370-375); TPUs have no fast f64,
so here ``v`` is computed in 58-bit integer fixed point via per-modulus
reciprocal words ``M_i = floor(2^122 / q_i)`` — *more* precise than the
reference's float64 (2^-57 vs 2^-52 worst-case error), hence exact on every
input the reference is exact on.

All functions are batched over leading dims and vectorized over [L, N]
coefficient planes (U64 two-plane representation).
"""

from __future__ import annotations

import numpy as np

from lattigo_tpu.ops import modred, number_theory as nt
from lattigo_tpu.ops import u64 as u

U64 = u.U64
_V_FRAC_BITS = 58  # fixed-point fractional bits of the correction term


def _pairs(vals, shape):
    return u.from_u64(np.array(vals, dtype=np.uint64).reshape(shape))


class ModUpParams:
    """Precomputed tables for exact base conversion src -> dst
    (ring/ring_basis_extension.go:76-145, basisextenderparameters)."""

    def __init__(self, src: list[int], dst: list[int]):
        self.src = [int(q) for q in src]
        self.dst = [int(p) for p in dst]
        ls, ld = len(src), len(dst)
        big_q = 1
        for q in src:
            big_q *= q

        qib = []          # (Q/qi)^-1 mod qi, Montgomery form
        m_lo, m_hi = [], []  # M_i = floor(2^(64+58)/q_i) words for v
        for q in self.src:
            q_star = big_q // q
            qib.append(nt.mform(pow(q_star, -1, q), q))
            m = (1 << (64 + _V_FRAC_BITS)) // q
            m_lo.append(m & nt.MASK64)
            m_hi.append(m >> 64)

        # (Q/qi) mod pj, Montgomery form wrt pj — [ls, ld]
        qispj = [
            [nt.mform((big_q // q) % p, p) for p in self.dst] for q in self.src
        ]
        # correction: (-Q) mod pj, Montgomery form wrt pj (+ plain, for the
        # centered-lift conditional subtraction)
        negq = [nt.mform((-big_q) % p, p) for p in self.dst]
        negq_plain = [(-big_q) % p for p in self.dst]

        self.qib_mont_ = _pairs(qib, (ls, 1))
        self.m_lo_ = _pairs(m_lo, (ls, 1))
        self.m_hi_ = _pairs(m_hi, (ls, 1))
        self.qispj_mont_host = qispj
        self.negq_mont_ = _pairs(negq, (ld, 1))
        self.negq_plain_host = negq_plain

        self.sq_ = _pairs(self.src, (ls, 1))
        self.sqinv_ = _pairs([nt.mred_params(q) for q in self.src], (ls, 1))
        self.dp_ = _pairs(self.dst, (ld, 1))
        self.dpinv_ = _pairs([nt.mred_params(p) for p in self.dst], (ld, 1))
        self.dp_u0_ = _pairs([nt.bred_params(p)[0] for p in self.dst], (ld, 1))


def mod_up(
    x: U64,
    mp: ModUpParams,
    dst_sel: tuple[int, ...] | None = None,
    centered: bool = False,
) -> U64:
    """Exact base conversion of ``x`` ([..., ls, N], basis src) to
    [..., len(dst_sel), N] in basis dst (ring/ring_basis_extension.go:352-393).

    ``dst_sel`` selects which destination limbs to produce (default: all).

    ``centered=True`` lifts the *centered* representative instead: the
    integer x - Q*[x >= Q/2] in (-Q/2, Q/2] re-expressed mod each p_j.  The
    comparison rides on the same 58-bit fixed-point accumulator as the
    overflow count v — its fractional part IS x/Q (sum y_i/q_i = v + x/Q),
    so bit F-1 decides the half.  This replaces the reference's host big-int
    centering (dckks/public_refresh.go:102-151) with one device pass; like
    the v floor itself it is exact except for x within ~2^-58*Q of Q/2,
    where the smudging mask makes the input uniform (probability ~2^-45
    per coefficient vs the reference's own float64-path window of 2^-52).
    """
    ls = x[0].shape[-2]
    assert ls == len(mp.src), (ls, len(mp.src))
    sel = tuple(range(len(mp.dst))) if dst_sel is None else tuple(dst_sel)

    # y_i = x_i * (Q/q_i)^-1 mod q_i
    y = modred.mred(x, mp.qib_mont_, mp.sq_, mp.sqinv_)

    # v = floor(sum_i y_i / q_i) in 58-bit fixed point.
    def limb(t: U64, i: int) -> U64:
        return (t[0][..., i : i + 1, :], t[1][..., i : i + 1, :])

    vacc = None
    for i in range(ls):
        yi = limb(y, i)
        ti = u.add64(
            u.mulhi64(yi, limb(mp.m_lo_, i)), u.mullo64(yi, limb(mp.m_hi_, i))
        )
        vacc = ti if vacc is None else u.add64(vacc, ti)
    # Floor with upward slack covering the per-term truncation (< 2 units
    # each): exact [0, Q) lift for every x except x within ~2^-53*Q of Q,
    # which maps to the centered representative x - Q instead (a +-Q shift
    # the downstream divisions absorb as +-1 rounding noise).  The
    # reference's float64 floor (ring/ring_basis_extension.go:370-378) is
    # nondeterministically off by one in the same boundary window; this
    # fixed-point version is deterministic and exact on tiny-positive inputs
    # (fresh error polynomials) where the float64 path can err.
    v = u.shr64(u.add64(vacc, u.const64(2 * ls + 1)), _V_FRAC_BITS)

    dp = (mp.dp_[0][sel, :], mp.dp_[1][sel, :])
    dpinv = (mp.dpinv_[0][sel, :], mp.dpinv_[1][sel, :])
    dp_u0 = (mp.dp_u0_[0][sel, :], mp.dp_u0_[1][sel, :])
    negq = (mp.negq_mont_[0][sel, :], mp.negq_mont_[1][sel, :])

    # acc_j = sum_i y_i * (Q/q_i mod p_j), lazily reduced every 7 adds.
    acc = None
    pending = 0
    for i in range(ls):
        row = _pairs(
            [mp.qispj_mont_host[i][j] for j in sel], (len(sel), 1)
        )
        term = modred.mred(limb(y, i), row, dp, dpinv)
        acc = term if acc is None else u.add64(acc, term)
        pending += 1
        if pending == 7:
            acc = modred.bred_add(acc, dp, dp_u0)
            pending = 1
    # correction term v * (-Q) mod p_j
    corr = modred.mred(v, negq, dp, dpinv)
    out = modred.bred_add(u.add64(acc, corr), dp, dp_u0)
    if centered:
        # x >= Q/2 <=> fractional bit F-1 of the slack-adjusted accumulator
        half = u.shr64(u.add64(vacc, u.const64(2 * ls + 1)), _V_FRAC_BITS - 1)
        pred = (half[0] & 1).astype(bool)
        negq_plain = _pairs(
            [mp.negq_plain_host[j] for j in sel], (len(sel), 1)
        )
        shifted = modred.cred(u.add64(out, negq_plain), dp)
        out = u.select64(pred, shifted, out)
    return out


class FastBasisExtender:
    """Q <-> P extension and ModDown (divide-and-round by P or Q)
    (ring/ring_basis_extension.go:9-348)."""

    def __init__(self, ring_q, ring_p):
        self.ring_q = ring_q
        self.ring_p = ring_p
        self.params_qp = ModUpParams(ring_q.moduli, ring_p.moduli)
        self.params_pq = ModUpParams(ring_p.moduli, ring_q.moduli)
        # P^-1 mod q_i (Montgomery), Q^-1 mod p_j (Montgomery)
        big_p = ring_p.modulus_bigint
        big_q = ring_q.modulus_bigint
        self.mod_down_pq_ = _pairs(
            [nt.mform(pow(big_p % q, -1, q), q) for q in ring_q.moduli],
            (ring_q.L, 1),
        )
        self.mod_down_qp_ = _pairs(
            [nt.mform(pow(big_q % p, -1, p), p) for p in ring_p.moduli],
            (ring_p.L, 1),
        )
        # prefix ModUpParams Q[:l+1] -> P for level-aware QP extension
        self._qp_lvl = {}

    def _params_qp(self, lvl_q: int) -> ModUpParams:
        if lvl_q == self.ring_q.L - 1:
            return self.params_qp
        if lvl_q not in self._qp_lvl:
            self._qp_lvl[lvl_q] = ModUpParams(
                self.ring_q.moduli[: lvl_q + 1], self.ring_p.moduli
            )
        return self._qp_lvl[lvl_q]

    def mod_up_qp(self, x_q: U64) -> U64:
        """Extend [.., lq+1, N] (basis Q levels) to the full P basis."""
        return mod_up(x_q, self._params_qp(self.ring_q.level_of(x_q)))

    def mod_up_pq(self, x_p: U64, lvl_q: int) -> U64:
        """Extend a full-P-basis poly to Q limbs 0..lvl_q."""
        return mod_up(x_p, self.params_pq, dst_sel=tuple(range(lvl_q + 1)))

    def _div(self, x_main: U64, pool: U64, inv_mont: U64, ring) -> U64:
        lvl = ring.level_of(x_main)
        q = ring._c(ring.q_, lvl)
        qinv = ring._c(ring.qinv_, lvl)
        inv = (inv_mont[0][: lvl + 1], inv_mont[1][: lvl + 1])
        num = u.add64(x_main, u.sub64(q, pool))
        return modred.mred(num, inv, q, qinv)

    def mod_down_split_pq(self, x_q: U64, x_p: U64) -> U64:
        """(x - [x]_P) / P in basis Q, coefficient domain
        (ring/ring_basis_extension.go:281-311)."""
        lvl = self.ring_q.level_of(x_q)
        pool = self.mod_up_pq(x_p, lvl)
        return self._div(x_q, pool, self.mod_down_pq_, self.ring_q)

    def mod_down_split_ntt_pq(self, x_q: U64, x_p: U64) -> U64:
        """Same, NTT-domain inputs/outputs
        (ring/ring_basis_extension.go:207-245)."""
        lvl = self.ring_q.level_of(x_q)
        p_coeff = self.ring_p.intt(x_p)
        pool = self.ring_q.ntt(self.mod_up_pq(p_coeff, lvl))
        return self._div(x_q, pool, self.mod_down_pq_, self.ring_q)

    def mod_down_split_qp(self, x_q: U64, x_p: U64) -> U64:
        """(x - [x]_Q) / Q in basis P (ring/ring_basis_extension.go:314-348)."""
        pool = self.mod_up_qp(x_q)
        return self._div(x_p, pool, self.mod_down_qp_, self.ring_p)


class Decomposer:
    """Key-switch CRT decomposition D_beta(c) for arbitrary alpha = #P
    (ring/ring_basis_extension.go:398-601)."""

    def __init__(self, q_moduli: list[int], p_moduli: list[int]):
        self.q_moduli = [int(q) for q in q_moduli]
        self.p_moduli = [int(p) for p in p_moduli]
        self.n_q = len(q_moduli)
        self.n_p = len(p_moduli)
        self.alpha = len(p_moduli)
        self.beta = -(-len(q_moduli) // self.alpha)
        self.xalpha = [self.alpha] * self.beta
        if self.n_q % self.alpha != 0:
            self.xalpha[-1] = self.n_q % self.alpha
        self._params: dict[tuple[int, int], ModUpParams] = {}

    def _mod_up_params(self, beta_idx: int, index: int) -> ModUpParams:
        key = (beta_idx, index)
        if key not in self._params:
            start = beta_idx * self.alpha
            src = self.q_moduli[start : start + index + 2]
            dst = self.q_moduli + self.p_moduli
            self._params[key] = ModUpParams(src, dst)
        return self._params[key]

    def source_range(self, level: int, beta_idx: int) -> tuple[int, int]:
        """(start, count) of the source limbs block ``beta_idx`` actually
        reads at ``level`` — the limbs whose values pass through unmodified
        (callers may skip re-NTT-ing exactly these)."""
        alpha_i = self.xalpha[beta_idx]
        start = beta_idx * self.alpha
        end = start + alpha_i
        if (end > level + 1 and (level + 1) % self.n_p == 1) or alpha_i == 1:
            return start, 1
        if level >= alpha_i + start:
            index = alpha_i - 2
        else:
            index = (level - 1) % self.alpha
        return start, index + 2

    def decompose_and_split(self, level: int, beta_idx: int, x: U64) -> tuple[U64, U64]:
        """x ([level+1, N] basis Q, coefficient domain) -> block ``beta_idx``
        of the decomposition, returned in basis Q[0..level] and basis P
        (ring/ring_basis_extension.go:601-713, DecomposeAndSplit)."""
        import jax.numpy as jnp

        alpha_i = self.xalpha[beta_idx]
        start = beta_idx * self.alpha
        end = start + alpha_i

        def bcast(limb_lo, limb_hi, count):
            return (
                jnp.broadcast_to(limb_lo, (*limb_lo.shape[:-2], count, limb_lo.shape[-1])),
                jnp.broadcast_to(limb_hi, (*limb_hi.shape[:-2], count, limb_hi.shape[-1])),
            )

        if (end > level + 1 and (level + 1) % self.n_p == 1) or alpha_i == 1:
            # single-limb block: plain replication, no reconstruction
            sl = (x[0][..., start : start + 1, :], x[1][..., start : start + 1, :])
            return bcast(*sl, level + 1), bcast(*sl, self.n_p)

        if level >= alpha_i + start:
            index = self.xalpha[beta_idx] - 2
        else:
            index = (level - 1) % self.alpha

        mp = self._mod_up_params(beta_idx, index)
        nsrc = index + 2
        src = (x[0][..., start : start + nsrc, :], x[1][..., start : start + nsrc, :])

        # destination limbs: Q limbs outside the block + the P block; limbs
        # inside the block are the source residues themselves.
        out_q_idx = [j for j in range(level + 1) if not (start <= j < start + nsrc)]
        p_idx = [self.n_q + j for j in range(self.n_p)]
        conv = mod_up(src, mp, dst_sel=tuple(out_q_idx + p_idx))

        n_out_q = len(out_q_idx)
        conv_q = (conv[0][..., :n_out_q, :], conv[1][..., :n_out_q, :])
        x_p = (conv[0][..., n_out_q:, :], conv[1][..., n_out_q:, :])

        # reassemble Q part in limb order
        parts_lo, parts_hi = [], []
        ci = 0
        for j in range(level + 1):
            if start <= j < start + nsrc:
                k = j - start
                parts_lo.append(src[0][..., k : k + 1, :])
                parts_hi.append(src[1][..., k : k + 1, :])
            else:
                parts_lo.append(conv_q[0][..., ci : ci + 1, :])
                parts_hi.append(conv_q[1][..., ci : ci + 1, :])
                ci += 1
        x_q = (
            jnp.concatenate(parts_lo, axis=-2),
            jnp.concatenate(parts_hi, axis=-2),
        )
        return x_q, x_p
