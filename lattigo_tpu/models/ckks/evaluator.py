"""CKKS homomorphic evaluator (ckks/evaluator.go).

All ciphertexts are NTT-domain; levels are shape-encoded (limb count) and
scales are static Python floats, so jit traces specialize per (level, scale)
— mirroring the reference's per-level slice shrinking with static shapes.

NTT-domain constant operations exploit psi^(N/2) (the reference's
"psi_qi^2" trick, ckks/evaluator.go:407-443): a complex constant a+bi maps
to a + b*psi^(N/2) on the first N/2 coefficients and a - b*psi^(N/2) on the
rest.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from lattigo_tpu.models.ckks.context import get_context
from lattigo_tpu.models.ckks.elements import (
    Ciphertext,
    Plaintext,
    drop_to_level,
    polys_of,
)
from lattigo_tpu.ops import galois, modred, number_theory as nt, scaling
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.tjit import table, tjit

U64 = u.U64


def _hamming(x: int) -> int:
    return bin(x).count("1")


def _scale_up_exact(value: float, n: float, q: int) -> int:
    """round(n*value) mod q with sign handling (ckks/utils.go:22-48)."""
    x = float(n) * float(value)
    neg = x < 0
    c = int(abs(x) + 0.5)
    r = c % q
    return (q - r) % q if neg else r


class Evaluator:
    def __init__(self, params):
        self.ctx = get_context(params)
        self.params = self.ctx.params

    # ---- scale-matched linear ops (ckks/evaluator.go:227-342) ------------

    def _mul_int(self, polys: list[U64], c: int) -> list[U64]:
        return [self.ctx.ring_q.mul_scalar(p, c) for p in polys]

    def _prep_pair(self, op0, op1):
        """Common level + matched scales; returns (polys0, polys1, lvl, scale)."""
        lvl = min(op0.level, op1.level)
        v0 = [drop_to_level(p, lvl) for p in polys_of(op0)]
        v1 = [drop_to_level(p, lvl) for p in polys_of(op1)]
        s0, s1 = op0.scale, op1.scale
        if s0 > s1 and int(s0 / s1) != 0:
            v1 = self._mul_int(v1, int(s0 / s1))
        elif s1 > s0 and int(s1 / s0) != 0:
            v0 = self._mul_int(v0, int(s1 / s0))
        return v0, v1, lvl, max(s0, s1)

    def add(self, op0, op1) -> Ciphertext:
        ring = self.ctx.ring_q
        v0, v1, lvl, sc = self._prep_pair(op0, op1)
        lo, hi = (v0, v1) if len(v0) >= len(v1) else (v1, v0)
        out = [ring.add(v0[i], v1[i]) for i in range(len(hi))]
        out += list(lo[len(hi) :])
        return Ciphertext(out, sc)

    def sub(self, op0, op1) -> Ciphertext:
        ring = self.ctx.ring_q
        v0, v1, lvl, sc = self._prep_pair(op0, op1)
        mn = min(len(v0), len(v1))
        out = [ring.sub(v0[i], v1[i]) for i in range(mn)]
        out += [ring.neg(p) for p in v1[mn:]]
        out += list(v0[mn:])
        return Ciphertext(out, sc)

    def neg(self, ct) -> Ciphertext:
        ring = self.ctx.ring_q
        return Ciphertext([ring.neg(p) for p in polys_of(ct)], ct.scale)

    def reduce(self, ct) -> Ciphertext:
        ring = self.ctx.ring_q
        return Ciphertext([ring.reduce(p) for p in polys_of(ct)], ct.scale)

    def drop_level(self, ct: Ciphertext, levels: int) -> Ciphertext:
        lvl = ct.level - levels
        return Ciphertext(
            [drop_to_level(p, lvl) for p in ct.value], ct.scale, ct.is_ntt
        )

    # ---- NTT-domain constants (ckks/evaluator.go:375-831) ----------------

    def _const_planes(self, c_real, c_imag, scale: float, lvl: int, mont: bool):
        """[lvl+1, N] constant with the +-psi^(N/2) half split — tjit-managed
        so per-coefficient planes of a polynomial evaluation ride in as
        device arguments instead of re-baked HLO constants."""
        name = (
            f"{self.ctx.ring_q.key}/ckksconst/"
            f"{c_real!r}/{c_imag!r}/{scale!r}/{lvl}/{int(mont)}"
        )
        return table(
            name, lambda: self._const_planes_host(c_real, c_imag, scale, lvl, mont)
        )

    def _const_planes_host(self, c_real, c_imag, scale: float, lvl: int, mont: bool):
        ctx = self.ctx
        n = ctx.n
        rows = np.empty((lvl + 1, n), dtype=np.uint64)
        for i, q in enumerate(ctx.ring_q.moduli[: lvl + 1]):
            re = _scale_up_exact(c_real, scale, q) if c_real else 0
            if c_imag:
                psi_half = nt.inv_mform(int(ctx.ring_q.ntt_psi_host[i][1]), q)
                im = _scale_up_exact(c_imag, scale, q) * psi_half % q
            else:
                im = 0
            first = (re + im) % q
            second = (re - im) % q
            if mont:
                first = nt.mform(first, q)
                second = nt.mform(second, q)
            rows[i, : n // 2] = first
            rows[i, n // 2 :] = second
        return u.from_u64(rows)

    @staticmethod
    def _split_const(constant):
        if isinstance(constant, complex):
            return constant.real, constant.imag
        return float(constant), 0.0

    def _needs_scale(self, c_real, c_imag) -> float:
        need = (c_real and c_real != int(c_real)) or (
            c_imag and c_imag != int(c_imag)
        )
        return self.ctx.scale if need else 1.0

    def add_const(self, ct: Ciphertext, constant) -> Ciphertext:
        """ckks/evaluator.go:375-443."""
        c_real, c_imag = self._split_const(constant)
        lvl = ct.level
        plane = self._const_planes(c_real, c_imag, ct.scale, lvl, mont=False)
        ring = self.ctx.ring_q
        q = ring._c(ring.q_, lvl)
        out = [modred.cred(u.add64(ct.value[0], plane), q)] + list(ct.value[1:])
        return Ciphertext(out, ct.scale)

    def mult_by_const(self, ct: Ciphertext, constant) -> Ciphertext:
        """ckks/evaluator.go:560-680."""
        c_real, c_imag = self._split_const(constant)
        scale = self._needs_scale(c_real, c_imag)
        lvl = ct.level
        plane = self._const_planes(c_real, c_imag, scale, lvl, mont=True)
        ring = self.ctx.ring_q
        out = [ring.mul_coeffs_montgomery(p, plane) for p in ct.value]
        return Ciphertext(out, ct.scale * scale)

    def new_zero_ciphertext(self, lvl: int, scale: float, degree: int = 1) -> Ciphertext:
        z = u.zeros64((lvl + 1, self.ctx.n))
        return Ciphertext([z] * (degree + 1), scale)

    def mult_by_const_and_add(self, ct: Ciphertext, constant, acc: Ciphertext) -> Ciphertext:
        """acc + ct*constant with the reference's scale equalization
        (ckks/evaluator.go:446-607)."""
        c_real, c_imag = self._split_const(constant)
        lvl = min(ct.level, acc.level)
        ct = self.drop_level(ct, ct.level - lvl) if ct.level > lvl else ct
        acc = self.drop_level(acc, acc.level - lvl) if acc.level > lvl else acc
        scale = self._needs_scale(c_real, c_imag)
        if scale != 1.0:
            if acc.scale < ct.scale * scale:
                ratio = int((scale * ct.scale) / acc.scale)
                if ratio:
                    acc = Ciphertext(
                        self._mul_int(acc.value, ratio), scale * ct.scale
                    )
            elif acc.scale > ct.scale * scale:
                scale = acc.scale / ct.scale
        else:
            if acc.scale > ct.scale:
                scale = acc.scale / ct.scale
            elif ct.scale > acc.scale:
                ratio = int(ct.scale / acc.scale)
                if ratio:
                    acc = Ciphertext(self._mul_int(acc.value, ratio), ct.scale)
        plane = self._const_planes(c_real, c_imag, scale, lvl, mont=True)
        ring = self.ctx.ring_q
        out = []
        for i in range(len(acc.value)):
            if i < len(ct.value):
                out.append(
                    ring.mul_coeffs_montgomery_and_add(plane, ct.value[i], acc.value[i])
                )
            else:
                out.append(acc.value[i])
        return Ciphertext(out, acc.scale)

    def mult_by_i(self, ct: Ciphertext) -> Ciphertext:
        return self.mult_by_const(ct, 1j)

    def div_by_i(self, ct: Ciphertext) -> Ciphertext:
        return self.mult_by_const(ct, -1j)

    def scale_up(self, ct: Ciphertext, scale: float) -> Ciphertext:
        out = self.mult_by_const(ct, int(scale))
        return Ciphertext(out.value, ct.scale * scale)

    def mul_by_pow2(self, ct: Ciphertext, pow2: int) -> Ciphertext:
        return Ciphertext(
            [self.ctx.ring_q.mul_scalar(p, 1 << pow2) for p in ct.value], ct.scale
        )

    # ---- rescaling (ckks/evaluator.go:901-995) ---------------------------

    def rescale(self, ct: Ciphertext, threshold: float | None = None) -> Ciphertext:
        threshold = threshold if threshold is not None else self.ctx.scale
        ring = self.ctx.ring_q
        if ct.level == 0:
            # the reference returns an error here that its own polynomial
            # evaluators ignore (ckks/evaluator.go:936-939) — i.e. a no-op;
            # we mirror that so deep circuits degrade gracefully
            return ct
        scale = ct.scale
        value = list(ct.value)
        lvl = ct.level
        stack = lambda ps: (jnp.stack([q[0] for q in ps]),
                            jnp.stack([q[1] for q in ps]))
        n_pol = len(value)
        while scale >= (threshold * ring.moduli[lvl]) / 2 and lvl != 0:
            scale /= float(ring.moduli[lvl])
            # both ciphertext polys dropped in ONE batched call
            st = scaling.div_round_by_last_modulus_ntt(ring, stack(value))
            value = [(st[0][k], st[1][k]) for k in range(n_pol)]
            lvl -= 1
        return Ciphertext(value, scale)

    def rescale_many(self, ct: Ciphertext, nb: int) -> Ciphertext:
        ring = self.ctx.ring_q
        scale = ct.scale
        for i in range(nb):
            scale /= float(ring.moduli[ct.level - i])
        stack = lambda ps: (jnp.stack([q[0] for q in ps]),
                            jnp.stack([q[1] for q in ps]))
        n_pol = len(ct.value)
        st = ring.intt(stack(ct.value))
        st = scaling.div_round_by_last_modulus_many(ring, st, nb)
        st = ring.ntt(st)
        value = [(st[0][k], st[1][k]) for k in range(n_pol)]
        return Ciphertext(value, scale)

    # ---- multiplication (ckks/evaluator.go:1016-1133) --------------------

    def mul_relin(self, op0, op1, rlk=None) -> Ciphertext:
        assert op0.degree <= 1 and op1.degree <= 1
        ring = self.ctx.ring_q
        lvl = min(op0.level, op1.level)
        v0 = [drop_to_level(p, lvl) for p in polys_of(op0)]
        v1 = [drop_to_level(p, lvl) for p in polys_of(op1)]
        out_scale = op0.scale * op1.scale

        if len(v0) + len(v1) == 4:  # ct x ct
            c00 = ring.mform(v0[0])
            c01 = ring.mform(v0[1])
            c0 = ring.mul_coeffs_montgomery(c00, v1[0])
            c1 = ring.add(
                ring.mul_coeffs_montgomery(c00, v1[1]),
                ring.mul_coeffs_montgomery(c01, v1[0]),
            )
            c2 = ring.mul_coeffs_montgomery(c01, v1[1])
            if rlk is None:
                return Ciphertext([c0, c1, c2], out_scale)
            p0, p1 = self._switch_keys_core(lvl, c2, rlk.evakey)
            return Ciphertext([ring.add(c0, p0), ring.add(c1, p1)], out_scale)

        # pt x ct (or ct x pt)
        big, small = (v0, v1) if len(v0) == 2 else (v1, v0)
        c00 = ring.mform(small[0])
        return Ciphertext(
            [ring.mul_coeffs_montgomery(c00, p) for p in big], out_scale
        )

    def relinearize(self, ct: Ciphertext, rlk) -> Ciphertext:
        assert ct.degree == 2
        ring = self.ctx.ring_q
        p0, p1 = self._switch_keys_core(ct.level, ct.value[2], rlk.evakey)
        return Ciphertext(
            [ring.add(ct.value[0], p0), ring.add(ct.value[1], p1)], ct.scale
        )

    def switch_keys(self, ct: Ciphertext, swk) -> Ciphertext:
        assert ct.degree == 1
        ring = self.ctx.ring_q
        p0, p1 = self._switch_keys_core(ct.level, ct.value[1], swk)
        return Ciphertext([ring.add(ct.value[0], p0), p1], ct.scale)

    # ---- key switching core (ckks/evaluator.go:1475-1591) ----------------

    def _decompose_stacked(self, lvl: int, c2_coeff: U64):
        """All beta(lvl) decomposition blocks, NTT domain, stacked into ONE
        [beta, (lvl+1)+n_p, N] tensor transformed by a single batched NTT
        (decomposeAndSplitNTT, ckks/evaluator.go:1561-1591 — the reference's
        per-block skip of already-NTT'd limbs is dropped in favor of one
        fused batched transform: same values mod q, one jit trace, and the
        batch feeds the TPU kernels at full width).

        Returns (planes, limbs) where limbs are ring_qp table indices for
        the stacked limb axis."""
        ctx = self.ctx
        dec = ctx.decomposer
        n_q = dec.n_q
        planes_lo, planes_hi = [], []
        for i in range(self.params.beta(lvl)):
            xq, xp = dec.decompose_and_split(lvl, i, c2_coeff)
            planes_lo.append(jnp.concatenate([xq[0], xp[0]], axis=-2))
            planes_hi.append(jnp.concatenate([xq[1], xp[1]], axis=-2))
        d = (jnp.stack(planes_lo, axis=-3), jnp.stack(planes_hi, axis=-3))
        limbs = tuple(range(lvl + 1)) + tuple(range(n_q, n_q + dec.n_p))
        return ctx.ring_qp.ntt_limbs(d, limbs), limbs

    def _key_planes(self, swk, beta: int, lvl: int):
        """Stacked [beta, (lvl+1)+n_p, N] Q+P key planes of both key halves."""
        nq = len(self.params.qi)

        def sel(k):
            return (
                jnp.concatenate([k[0][:beta, : lvl + 1], k[0][:beta, nq:]], axis=-2),
                jnp.concatenate([k[1][:beta, : lvl + 1], k[1][:beta, nq:]], axis=-2),
            )

        return sel(swk.key0), sel(swk.key1)

    def _inner_product(self, d: U64, limbs, swk, beta: int, lvl: int):
        """sum_i key_i (.) d_i with the reference's lazy-reduction discipline
        (reduce every 7 accumulated [0,q) products: ckks/evaluator.go:1536),
        folding over the stacked block axis of one batched Montgomery mul."""
        rqp = self.ctx.ring_qp
        k0, k1 = self._key_planes(swk, beta, lvl)
        t0 = rqp.mul_coeffs_montgomery_limbs(k0, d, limbs)
        t1 = rqp.mul_coeffs_montgomery_limbs(k1, d, limbs)

        def fold(t):
            acc = (t[0][..., 0, :, :], t[1][..., 0, :, :])
            pending = 1
            for i in range(1, beta):
                acc = u.add64(acc, (t[0][..., i, :, :], t[1][..., i, :, :]))
                pending += 1
                if pending == 7:
                    acc = rqp.reduce_limbs(acc, limbs)
                    pending = 1
            return rqp.reduce_limbs(acc, limbs)

        return fold(t0), fold(t1)

    def _switch_keys_core(self, lvl: int, cx_ntt: U64, swk) -> tuple[U64, U64]:
        ctx = self.ctx
        c2_coeff = ctx.ring_q.intt(cx_ntt)
        beta = self.params.beta(lvl)
        d, limbs = self._decompose_stacked(lvl, c2_coeff)
        a0, a1 = self._inner_product(d, limbs, swk, beta, lvl)
        nqs = lvl + 1
        split = lambda x: ((x[0][..., :nqs, :], x[1][..., :nqs, :]),
                           (x[0][..., nqs:, :], x[1][..., nqs:, :]))
        bx = ctx.basis_q_p
        p0 = bx.mod_down_split_ntt_pq(*split(a0))
        p1 = bx.mod_down_split_ntt_pq(*split(a1))
        return p0, p1

    # ---- rotations (ckks/evaluator.go:1201-1473) -------------------------

    def _permute(self, ct: Ciphertext, gal_el: int, swk) -> Ciphertext:
        ring = self.ctx.ring_q
        e0 = galois.permute_ntt(ct.value[0], gal_el)
        e1 = galois.permute_ntt(ct.value[1], gal_el)
        p0, p1 = self._switch_keys_core(ct.level, e1, swk)
        return Ciphertext([ring.add(e0, p0), p1], ct.scale)

    def rotate_columns(self, ct: Ciphertext, k: int, rot_keys) -> Ciphertext:
        ctx = self.ctx
        n = ctx.n
        k &= (n >> 1) - 1
        if k == 0:
            return ct.copy()
        if k in rot_keys.left:
            return self._permute(ct, ctx.gal_el_rot_col_left[k], rot_keys.left[k])
        if _hamming(k) <= _hamming((n >> 1) - k):
            return self._rotate_pow2(ct, ctx.gal_el_rot_col_left, k, rot_keys.left)
        return self._rotate_pow2(
            ct, ctx.gal_el_rot_col_right, (n >> 1) - k, rot_keys.right
        )

    def _rotate_pow2(self, ct: Ciphertext, gal_tbl, k: int, keys) -> Ciphertext:
        out = ct.copy()
        idx = 1
        while k > 0:
            if k & 1:
                if idx not in keys:
                    raise ValueError(f"missing pow2 rotation key {idx}")
                out = self._permute(out, gal_tbl[idx], keys[idx])
            idx <<= 1
            k >>= 1
        return out

    def conjugate(self, ct: Ciphertext, rot_keys) -> Ciphertext:
        assert rot_keys.conjugate is not None, "conjugation key not generated"
        return self._permute(ct, self.ctx.gal_el_conjugate, rot_keys.conjugate)

    def rotate_hoisted(self, ct: Ciphertext, rotations, rot_keys) -> dict[int, Ciphertext]:
        """Decompose c1 once, then per rotation only permute + inner product
        (ckks/evaluator.go:1252-1392)."""
        ctx = self.ctx
        rq = ctx.ring_q
        lvl = ct.level
        beta = self.params.beta(lvl)
        c2_coeff = rq.intt(ct.value[1])
        d, limbs = self._decompose_stacked(lvl, c2_coeff)
        out: dict[int, Ciphertext] = {}
        nqs = lvl + 1
        split = lambda x: ((x[0][..., :nqs, :], x[1][..., :nqs, :]),
                           (x[0][..., nqs:, :], x[1][..., nqs:, :]))
        for k in rotations:
            k &= (ctx.n >> 1) - 1
            if k == 0:
                out[k] = ct.copy()
                continue
            if k not in rot_keys.left:
                raise ValueError(f"missing rotation key {k}")
            gal_el = ctx.gal_el_rot_col_left[k]
            swk = rot_keys.left[k]
            d_p = galois.permute_ntt(d, gal_el)
            a0, a1 = self._inner_product(d_p, limbs, swk, beta, lvl)
            bx = ctx.basis_q_p
            p0 = bx.mod_down_split_ntt_pq(*split(a0))
            p1 = bx.mod_down_split_ntt_pq(*split(a1))
            c0 = rq.add(galois.permute_ntt(ct.value[0], gal_el), p0)
            out[k] = Ciphertext([c0, p1], ct.scale)
        return out


class JitEvaluator(Evaluator):
    """Per-op compiled evaluator: every primitive runs as its own tjit'd
    program, trace-cached per (level, scale, shape) signature and with all
    twiddle/key tables threaded as device arguments.

    This is the TPU answer to the reference's interpreter-style evaluator
    (ckks/evaluator.go): a deep circuit (e.g. a degree-31 Chebyshev,
    examples/ckks/examples_ckks.go:22) re-uses one compiled program per op
    signature instead of tracing the whole circuit into one monolithic
    XLA program — compile time grows with the number of DISTINCT
    (op, level, scale) combinations, not with circuit size.
    """

    _JIT_OPS = (
        "add", "sub", "neg", "reduce", "add_const", "mult_by_const",
        "mult_by_const_and_add", "scale_up", "mul_by_pow2", "rescale",
        "rescale_many", "mul_relin", "relinearize", "switch_keys",
        "rotate_columns", "conjugate",
    )

    def __init__(self, params):
        super().__init__(params)
        self._jops: dict = {}

    def __getattribute__(self, name):
        if name in JitEvaluator._JIT_OPS:
            jops = object.__getattribute__(self, "_jops")
            fn = jops.get(name)
            if fn is None:
                base = getattr(Evaluator, name)
                fn = tjit(functools.partial(base, self))
                jops[name] = fn
            return fn
        return object.__getattribute__(self, name)
