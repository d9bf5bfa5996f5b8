"""BFV homomorphic evaluator (bfv/evaluator.go).

Structure mirrors the reference's call graph (tensorAndRescale for Mul,
beta-block CRT decomposition for key switching) but every inner loop is a
vectorized pass over whole [L, N] limb stacks, and the key-switch inner
product runs over stacked [beta, L_QP, N] key planes instead of a scalar
beta-loop.  All methods are pure (no scratch pools — XLA owns buffers), so
whole pipelines can be wrapped in jax.jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from lattigo_tpu.models.bfv.context import get_context
from lattigo_tpu.models.bfv.elements import Ciphertext, Plaintext, polys_of
from lattigo_tpu.ops import galois
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.number_theory import MASK64

U64 = u.U64


def _hamming(x: int) -> int:
    return bin(x).count("1")


class Evaluator:
    def __init__(self, params):
        self.ctx = get_context(params)
        self.params = self.ctx.params

    # ---- linear ops (bfv/evaluator.go:142-276) ---------------------------

    def _binary(self, op0, op1, fn) -> list[U64]:
        v0, v1 = polys_of(op0), polys_of(op1)
        lo, hi = (v0, v1) if len(v0) >= len(v1) else (v1, v0)
        out = [fn(v0[i], v1[i]) for i in range(len(hi))]
        out += [p for p in lo[len(hi) :]]
        return out

    def add(self, op0, op1) -> Ciphertext:
        return Ciphertext(self._binary(op0, op1, self.ctx.ring_q.add))

    def sub(self, op0, op1) -> Ciphertext:
        ring = self.ctx.ring_q
        out = self._binary(op0, op1, ring.sub)
        d0, d1 = len(polys_of(op0)), len(polys_of(op1))
        if d0 < d1:  # the copied tail came from op1: negate it
            out[d0:] = [ring.neg(p) for p in out[d0:]]
        return Ciphertext(out)

    def neg(self, op) -> Ciphertext:
        return Ciphertext([self.ctx.ring_q.neg(p) for p in polys_of(op)])

    def reduce(self, op) -> Ciphertext:
        return Ciphertext([self.ctx.ring_q.reduce(p) for p in polys_of(op)])

    def mul_scalar(self, op, scalar: int) -> Ciphertext:
        return Ciphertext(
            [self.ctx.ring_q.mul_scalar(p, scalar) for p in polys_of(op)]
        )

    # ---- multiplication (bfv/evaluator.go:278-464) -----------------------

    def mul(self, op0: Ciphertext, op1) -> Ciphertext:
        return Ciphertext(self._tensor_and_rescale(polys_of(op0), polys_of(op1)))

    def _lift(self, polys: list[U64]) -> tuple[list[U64], list[U64]]:
        """Q -> (NTT_Q, NTT_QMul) per poly (bfv/evaluator.go:298-313).

        The per-poly transforms are independent, so each ring runs ONE
        batched NTT over a stacked leading axis (instead of len(polys)
        batch-1 calls) — putting single-ciphertext multiplies onto the
        batched MXU kernel path (ops/mxu_ntt.py)."""
        import jax.numpy as jnp

        ctx = self.ctx
        bx = ctx.basis_q_qmul
        stack = lambda ps: (jnp.stack([p[0] for p in ps]),
                            jnp.stack([p[1] for p in ps]))
        nq = ctx.ring_q.ntt(stack(polys))
        nm = ctx.ring_qmul.ntt(stack([bx.mod_up_qp(p) for p in polys]))
        unstack = lambda st, i: (st[0][i], st[1][i])
        qs = [unstack(nq, i) for i in range(len(polys))]
        ms = [unstack(nm, i) for i in range(len(polys))]
        return qs, ms

    def _tensor_and_rescale(self, v0: list[U64], v1: list[U64]) -> list[U64]:
        ctx = self.ctx
        rq, rm = ctx.ring_q, ctx.ring_qmul
        same = v0 is v1
        c0q, c0m = self._lift(v0)
        c1q, c1m = (c0q, c0m) if same else self._lift(v1)

        out_deg = len(v0) + len(v1) - 2
        accq: list[U64 | None] = [None] * (out_deg + 1)
        accm: list[U64 | None] = [None] * (out_deg + 1)

        def acc(ring, store, k, term):
            store[k] = term if store[k] is None else ring.add(store[k], term)

        for i in range(len(v0)):
            m0q, m0m = rq.mform(c0q[i]), rm.mform(c0m[i])
            js = range(i, len(v1)) if same else range(len(v1))
            for j in js:
                tq = rq.mul_coeffs_montgomery(m0q, c1q[j])
                tm = rm.mul_coeffs_montgomery(m0m, c1m[j])
                if same and j > i:  # cross terms count twice when squaring
                    tq = rq.add(tq, tq)
                    tm = rm.add(tm, tm)
                acc(rq, accq, i + j, tq)
                acc(rm, accm, i + j, tm)

        # InvNTT, divide by Q, recenter, extend back to Q, multiply by t
        # (bfv/evaluator.go:424-462)
        import jax.numpy as jnp

        bx = ctx.basis_q_qmul
        p_half = rm.modulus_bigint >> 1
        lvl_q = rq.L - 1
        # one batched InvNTT per ring over the stacked output degrees, and
        # the whole divide-by-Q tail batched the same way (all basis ops
        # broadcast over leading dims)
        stack = lambda ps: (jnp.stack([p[0] for p in ps]),
                            jnp.stack([p[1] for p in ps]))
        cq = rq.intt(stack([accq[k] for k in range(out_deg + 1)]))
        cm = rm.intt(stack([accm[k] for k in range(out_deg + 1)]))
        cm = bx.mod_down_split_qp(cq, cm)  # (x - [x]_Q)/Q in QMul
        cm = rm.add_scalar_bigint(cm, p_half)
        cq = bx.mod_up_pq(cm, lvl_q)
        cq = rq.sub_scalar_bigint(cq, p_half)
        cq = rq.mul_scalar(cq, ctx.params.t)
        return [(cq[0][k], cq[1][k]) for k in range(out_deg + 1)]

    # ---- key switching (bfv/evaluator.go:736-813) ------------------------

    def _decompose_ntt(self, cx: U64, c2_ntt: U64) -> tuple[U64, U64]:
        """All beta decomposition blocks of cx, NTT domain, stacked
        [beta, L_QP, N].  Block limbs reuse c2_ntt instead of a fresh NTT
        (the skip at bfv/evaluator.go:775-782).

        The beta blocks stack on a leading axis and run as ONE batched NTT
        per ring (two calls total instead of 2*beta batch-1 calls): the
        Q-basis call transforms all n_q limbs uniformly and the block
        limbs — whose decomposed values equal cx's own reduced limbs — are
        then overwritten with the matching c2_ntt rows, preserving the
        reference's skip semantics bit for bit."""
        import numpy as np

        ctx = self.ctx
        dec = ctx.decomposer
        rq, rqp = ctx.ring_q, ctx.ring_qp
        n_q, n_p = dec.n_q, dec.n_p
        level = rq.L - 1
        splits = [dec.decompose_and_split(level, i, cx) for i in range(dec.beta)]
        stack = lambda ps: (jnp.stack([p[0] for p in ps]),
                            jnp.stack([p[1] for p in ps]))
        xq = stack([sp[0] for sp in splits])  # [beta, ..., n_q, N]
        xp = stack([sp[1] for sp in splits])  # [beta, ..., n_p, N]
        nq_ntt = rq.ntt_limbs(xq, tuple(range(n_q)))
        np_ntt = rqp.ntt_limbs(xp, tuple(range(n_q, n_q + n_p)))

        # host mask of block limbs per beta index
        mask = np.zeros((dec.beta, n_q), dtype=bool)
        for i in range(dec.beta):
            start = i * dec.alpha
            mask[i, start:min(start + dec.xalpha[i], n_q)] = True
        batch_nd = c2_ntt[0].ndim - 2
        mask = mask.reshape(dec.beta, *([1] * batch_nd), n_q, 1)
        blend = lambda a, c2: jnp.where(mask, c2, a)
        lo = jnp.concatenate(
            [blend(nq_ntt[0], c2_ntt[0]), np_ntt[0]], axis=-2)
        hi = jnp.concatenate(
            [blend(nq_ntt[1], c2_ntt[1]), np_ntt[1]], axis=-2)
        return lo, hi

    def _switch_keys_core(self, cx: U64, swk) -> tuple[U64, U64]:
        """p0, p1 = sum_beta key_i (.) D_i(cx), divided by P
        (bfv/evaluator.go:736-813).  cx in coefficient domain, basis Q."""
        ctx = self.ctx
        rqp = ctx.ring_qp
        c2_ntt = ctx.ring_q.ntt(cx)
        d = self._decompose_ntt(cx, c2_ntt)  # [beta, L_QP, N]

        def limb(t, i):
            return t[0][i], t[1][i]

        p0 = p1 = None
        pending = 0
        for i in range(ctx.decomposer.beta):
            di = limb(d, i)
            t0 = rqp.mul_coeffs_montgomery(limb(swk.key0, i), di)
            t1 = rqp.mul_coeffs_montgomery(limb(swk.key1, i), di)
            p0 = t0 if p0 is None else u.add64(p0, t0)
            p1 = t1 if p1 is None else u.add64(p1, t1)
            pending += 1
            if pending == 7:
                p0, p1 = rqp.reduce(p0), rqp.reduce(p1)
                pending = 1
        p0, p1 = rqp.reduce(p0), rqp.reduce(p1)
        p0 = rqp.intt(p0)
        p1 = rqp.intt(p1)
        nq = ctx.ring_q.L
        # ellipsis slicing: cx may carry leading batch dims (batched cloud
        # pipelines stack ciphertexts on a leading row axis)
        split = lambda x: (
            (x[0][..., :nq, :], x[1][..., :nq, :]),
            (x[0][..., nq:, :], x[1][..., nq:, :]),
        )
        bx = ctx.basis_q_p
        p0 = bx.mod_down_split_pq(*split(p0))
        p1 = bx.mod_down_split_pq(*split(p1))
        return p0, p1

    def relinearize(self, ct: Ciphertext, evk) -> Ciphertext:
        """Degree d -> 1 (bfv/evaluator.go:480-536)."""
        if ct.degree < 2:
            return ct.copy()
        ring = self.ctx.ring_q
        c0, c1 = ct.value[0], ct.value[1]
        for deg in range(ct.degree, 1, -1):
            p0, p1 = self._switch_keys_core(ct.value[deg], evk.evakey[deg - 2])
            c0 = ring.add(c0, p0)
            c1 = ring.add(c1, p1)
        return Ciphertext([c0, c1])

    def switch_keys(self, ct: Ciphertext, swk) -> Ciphertext:
        assert ct.degree == 1
        ring = self.ctx.ring_q
        p0, p1 = self._switch_keys_core(ct.value[1], swk)
        return Ciphertext([ring.add(ct.value[0], p0), p1])

    # ---- rotations (bfv/evaluator.go:565-733) ----------------------------

    def _permute(self, ct: Ciphertext, gal_el: int, swk) -> Ciphertext:
        ring = self.ctx.ring_q
        e0 = galois.permute(ring, ct.value[0], gal_el)
        e1 = galois.permute(ring, ct.value[1], gal_el)
        p0, p1 = self._switch_keys_core(e1, swk)
        return Ciphertext([ring.add(e0, p0), p1])

    def rotate_columns(self, ct: Ciphertext, k: int, rot_keys) -> Ciphertext:
        ctx = self.ctx
        n = ctx.n
        k &= (n >> 1) - 1
        if k == 0:
            return ct.copy()
        if k in rot_keys.left:
            return self._permute(ct, ctx.gal_el_rot_col_left[k], rot_keys.left[k])
        # pow2 decomposition path, lowest hamming weight side
        if _hamming(k) <= _hamming((n >> 1) - k):
            return self._rotate_pow2(ct, 5, k, rot_keys.left)
        return self._rotate_pow2(
            ct, pow(5, 2 * n - 1, 2 * n), (n >> 1) - k, rot_keys.right
        )

    def _rotate_pow2(self, ct: Ciphertext, gen: int, k: int, keys) -> Ciphertext:
        n = self.ctx.n
        mask = (n << 1) - 1
        out = ct.copy()
        idx = 1
        while k > 0:
            if k & 1:
                if idx not in keys:
                    raise ValueError(f"missing pow2 rotation key {idx}")
                out = self._permute(out, gen, keys[idx])
            gen = gen * gen & mask
            idx <<= 1
            k >>= 1
        return out

    def rotate_rows(self, ct: Ciphertext, rot_keys) -> Ciphertext:
        assert rot_keys.row is not None, "row rotation key not generated"
        return self._permute(ct, self.ctx.gal_el_rot_row, rot_keys.row)

    def inner_sum(self, ct: Ciphertext, rot_keys) -> Ciphertext:
        """Log-rotations + adds -> every slot holds the total sum
        (bfv/evaluator.go:691-708)."""
        out = ct.copy()
        i = 1
        while i < self.ctx.n >> 1:
            out = self.add(self.rotate_columns(out, i, rot_keys), out)
            i <<= 1
        return self.add(self.rotate_rows(out, rot_keys), out)
