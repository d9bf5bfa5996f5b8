"""Distributed (threshold) BFV protocols (dbfv/).

Every protocol follows the reference's 4-phase shape (SURVEY.md section 2.5):
GenShare (party-local) -> AggregateShares (associative modular add) ->
finalize.  Shares are pytrees of two-plane uint32 arrays, so they ship
directly over mesh collectives (see lattigo_tpu.parallel): aggregation is an
all-gather + modular fold over the ``party`` axis, the TPU-native stand-in
for the reference's in-process share passing.

Common randomness comes from the clock-synchronized blake2b CRP generator
(lattigo_tpu.utils.prng), exactly as dbfv/dbfv.go:70-73.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from lattigo_tpu.models import bfv
from lattigo_tpu.models.bfv.keygen import (
    EvaluationKey,
    PublicKey,
    RotationKeys,
    SwitchingKey,
)
from lattigo_tpu.ops import galois, samplers
from lattigo_tpu.ops import u64 as u

U64 = u.U64


class _Protocol:
    def __init__(self, params, rng_key=None, label: int = 0):
        self.ctx = bfv.get_context(params)
        self.params = self.ctx.params
        self._key = (
            rng_key if rng_key is not None else jax.random.key(1000 + label)
        )
        self._n_used = 0


    @contextlib.contextmanager
    def using_key(self, key):
        """Temporarily rebase the protocol's randomness on an explicit (possibly
        traced) PRNG key — the hook the party-mesh runner uses to give each
        mesh shard independent, reproducible noise inside shard_map."""
        old = self._key, self._n_used
        self._key = key
        self._n_used = 0
        try:
            yield
        finally:
            self._key, self._n_used = old

    def _next_key(self):
        self._n_used += 1
        return jax.random.fold_in(self._key, self._n_used)

    def _gauss_qp_ntt(self, sigma=None):
        ring = self.ctx.ring_qp
        sigma = sigma if sigma is not None else self.params.sigma
        return ring.ntt(samplers.gaussian_poly(self._next_key(), ring, sigma))

    def _split_qp(self, x: U64, lvl: int | None = None):
        nq = self.ctx.ring_q.L if lvl is None else lvl + 1
        full_q = self.ctx.ring_q.L
        return (x[0][:nq], x[1][:nq]), (x[0][full_q:], x[1][full_q:])

    def _add_block_q(self, e: U64, sk_scaled: U64, block: int) -> U64:
        """Add sk_scaled onto the Q limbs of decomposition block ``block``."""
        ring = self.ctx.ring_qp
        n_q = len(self.params.qi)
        start = block * self.params.alpha
        end = min(start + self.params.alpha, n_q)
        mask = jnp.zeros((ring.L, 1), dtype=bool).at[start:end].set(True)
        return u.select64(mask, ring.add(e, sk_scaled), e)


class CKGProtocol(_Protocol):
    """Collective public key generation (dbfv/publickey_gen.go)."""

    def gen_share(self, sk: U64, crp: U64) -> U64:
        """share_i = e_i - sk_i * crp, in QP NTT domain."""
        ring = self.ctx.ring_qp
        e = self._gauss_qp_ntt()
        return ring.mul_coeffs_montgomery_and_sub(sk, crp, e)

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_qp.add(s1, s2)

    def gen_public_key(self, combined: U64, crp: U64) -> PublicKey:
        return PublicKey((combined, crp))


class CKSProtocol(_Protocol):
    """Collective key switch sk_in -> sk_out (dbfv/keyswitching.go)."""

    def __init__(self, params, sigma_smudging: float = 6.36, **kw):
        # default smudging noise matches the reference tests
        # (dbfv/dbfv_test.go:355,409: 6.36)
        super().__init__(params, **kw)
        self.sigma_smudging = sigma_smudging

    def gen_share(self, sk_in: U64, sk_out: U64, ct: bfv.Ciphertext) -> U64:
        ctx = self.ctx
        rq = ctx.ring_q
        nq = rq.L
        delta = rq.sub(
            (sk_in[0][:nq], sk_in[1][:nq]), (sk_out[0][:nq], sk_out[1][:nq])
        )
        share = rq.ntt(ct.value[1])
        share = rq.mul_coeffs_montgomery(share, delta)
        share = rq.mul_scalar_bigint(share, ctx.ring_p.modulus_bigint)
        share = rq.intt(share)
        e = samplers.gaussian_poly(
            self._next_key(), ctx.ring_qp, self.sigma_smudging
        )
        e_q, e_p = self._split_qp(e)
        share = rq.add(share, e_q)
        return ctx.basis_q_p.mod_down_split_pq(share, e_p)

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_q.add(s1, s2)

    def key_switch(self, combined: U64, ct: bfv.Ciphertext) -> bfv.Ciphertext:
        return bfv.Ciphertext(
            [self.ctx.ring_q.add(ct.value[0], combined), ct.value[1]]
        )


class PCKSProtocol(_Protocol):
    """Public-key collective key switch sk -> pk (dbfv/public_keyswitching.go)."""

    def __init__(self, params, sigma_smudging: float = 6.36, **kw):
        # default smudging noise matches the reference tests
        # (dbfv/dbfv_test.go:355,409: 6.36)
        super().__init__(params, **kw)
        self.sigma_smudging = sigma_smudging

    def gen_share(self, sk: U64, pk: PublicKey, ct: bfv.Ciphertext) -> tuple[U64, U64]:
        ctx = self.ctx
        rqp, rq = ctx.ring_qp, ctx.ring_q
        nq = rq.L
        uu = rqp.ntt(
            samplers.ternary_poly(self._next_key(), rqp, 0.5, montgomery=True)
        )
        h0 = rqp.intt(rqp.mul_coeffs_montgomery(uu, pk.pk[0]))
        h1 = rqp.intt(rqp.mul_coeffs_montgomery(uu, pk.pk[1]))
        h0 = rqp.add(
            h0, samplers.gaussian_poly(self._next_key(), rqp, self.sigma_smudging)
        )
        h1 = rqp.add(
            h1, samplers.gaussian_poly(self._next_key(), rqp, self.params.sigma)
        )
        bx = ctx.basis_q_p
        s0 = bx.mod_down_split_pq(*self._split_qp(h0))
        s1 = bx.mod_down_split_pq(*self._split_qp(h1))
        sk_q = (sk[0][:nq], sk[1][:nq])
        tmp = rq.intt(rq.mul_coeffs_montgomery(rq.ntt(ct.value[1]), sk_q))
        return rq.add(s0, tmp), s1

    def aggregate(self, s1, s2):
        rq = self.ctx.ring_q
        return rq.add(s1[0], s2[0]), rq.add(s1[1], s2[1])

    def key_switch(self, combined, ct: bfv.Ciphertext) -> bfv.Ciphertext:
        return bfv.Ciphertext(
            [self.ctx.ring_q.add(ct.value[0], combined[0]), combined[1]]
        )


class RKGProtocol(_Protocol):
    """3-round collective relinearization key (dbfv/relinkey_gen.go)."""

    def new_ephemeral_key(self, p: float = 1.0 / 3.0) -> U64:
        ring = self.ctx.ring_qp
        return ring.ntt(
            samplers.ternary_poly(self._next_key(), ring, p=p, montgomery=True)
        )

    def _stack(self, polys):
        return (
            jnp.stack([p[0] for p in polys]),
            jnp.stack([p[1] for p in polys]),
        )

    def _unstack(self, stacked, i):
        return stacked[0][i], stacked[1][i]

    def gen_share_round_one(self, u_eph: U64, sk: U64, crp: U64) -> U64:
        """share_i = -u*crp + P*sk*1_block + e  (relinkey_gen.go:212-258)."""
        ring = self.ctx.ring_qp
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(sk, self.ctx.ring_p.modulus_bigint)
        )
        out = []
        for i in range(self.params.beta):
            e = self._gauss_qp_ntt()
            e = self._add_block_q(e, pool, i)
            out.append(ring.mul_coeffs_montgomery_and_sub(u_eph, self._unstack(crp, i), e))
        return self._stack(out)

    def gen_share_round_two(self, round1: U64, sk: U64, crp: U64) -> tuple[U64, U64]:
        """(s_i*round1 + e, s_i*crp + e') (relinkey_gen.go:267-291)."""
        ring = self.ctx.ring_qp
        o0, o1 = [], []
        for i in range(self.params.beta):
            t0 = ring.mul_coeffs_montgomery(self._unstack(round1, i), sk)
            o0.append(ring.add(t0, self._gauss_qp_ntt()))
            e2 = self._gauss_qp_ntt()
            o1.append(ring.mul_coeffs_montgomery_and_add(sk, self._unstack(crp, i), e2))
        return self._stack(o0), self._stack(o1)

    def gen_share_round_three(self, round2, u_eph: U64, sk: U64) -> U64:
        """(u_i - s_i) * round2[1] + e (relinkey_gen.go:310-325)."""
        ring = self.ctx.ring_qp
        diff = ring.sub(u_eph, sk)
        out = []
        for i in range(self.params.beta):
            e = self._gauss_qp_ntt()
            out.append(
                ring.mul_coeffs_montgomery_and_add(
                    diff, self._unstack(round2[1], i), e
                )
            )
        return self._stack(out)

    def aggregate(self, s1, s2):
        ring = self.ctx.ring_qp
        if isinstance(s1, tuple) and len(s1) == 2 and isinstance(s1[0], tuple):
            return ring.add(s1[0], s2[0]), ring.add(s1[1], s2[1])
        return ring.add(s1, s2)

    def gen_relinearization_key(self, round2, round3) -> EvaluationKey:
        """key = (MForm(round2[0] + round3), MForm(round2[1]))
        (relinkey_gen.go:333-348)."""
        ring = self.ctx.ring_qp
        k0 = ring.mform(ring.add(round2[0], round3))
        k1 = ring.mform(round2[1])
        return EvaluationKey([SwitchingKey(k0, k1)])


class RKGProtocolNaive(_Protocol):
    """2-round relinearization-key protocol via pseudo-encryptions under the
    collective public key (dbfv/relinkey_gen_naive.go)."""

    def _stack(self, polys):
        return (
            jnp.stack([p[0] for p in polys]),
            jnp.stack([p[1] for p in polys]),
        )

    def gen_share_round_one(self, sk: U64, pk: PublicKey) -> tuple[U64, U64]:
        """(cpk0*u + P*sk*1_block + e0, cpk1*u + e1) per block.

        Deliberate divergence: dbfv/relinkey_gen_naive.go's round one samples
        e1 over the e0 slot, leaving h1 noiseless; here e0/e1 go into their
        own halves (the cryptographically intended form)."""
        ring = self.ctx.ring_qp
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(sk, self.ctx.ring_p.modulus_bigint)
        )
        o0, o1 = [], []
        for i in range(self.params.beta):
            e0 = self._gauss_qp_ntt()
            e0 = self._add_block_q(e0, pool, i)
            e1 = self._gauss_qp_ntt()
            uu = ring.ntt(
                samplers.ternary_poly(self._next_key(), ring, 0.5, montgomery=True)
            )
            o0.append(ring.mul_coeffs_montgomery_and_add(pk.pk[0], uu, e0))
            o1.append(ring.mul_coeffs_montgomery_and_add(pk.pk[1], uu, e1))
        return self._stack(o0), self._stack(o1)

    def gen_share_round_two(self, round1, sk: U64, pk: PublicKey):
        """(sk*r1[0] + cpk0*v + e2, sk*r1[1] + cpk1*v + e3) per block."""
        ring = self.ctx.ring_qp
        o0, o1 = [], []
        for i in range(self.params.beta):
            r0 = (round1[0][0][i], round1[0][1][i])
            r1 = (round1[1][0][i], round1[1][1][i])
            h0 = ring.mul_coeffs_montgomery(r0, sk)
            h1 = ring.mul_coeffs_montgomery(r1, sk)
            vv = ring.ntt(
                samplers.ternary_poly(self._next_key(), ring, 0.5, montgomery=True)
            )
            h0 = ring.mul_coeffs_montgomery_and_add(pk.pk[0], vv, h0)
            h1 = ring.mul_coeffs_montgomery_and_add(pk.pk[1], vv, h1)
            o0.append(ring.add(h0, self._gauss_qp_ntt()))
            o1.append(ring.add(h1, self._gauss_qp_ntt()))
        return self._stack(o0), self._stack(o1)

    def aggregate(self, s1, s2):
        ring = self.ctx.ring_qp
        return ring.add(s1[0], s2[0]), ring.add(s1[1], s2[1])

    def gen_relinearization_key(self, round2) -> EvaluationKey:
        ring = self.ctx.ring_qp
        return EvaluationKey(
            [SwitchingKey(ring.mform(round2[0]), ring.mform(round2[1]))]
        )


class RTGProtocol(_Protocol):
    """Collective rotation-key generation (dbfv/rotkey_gen.go)."""

    def gen_share(self, rot_type: str, k: int, sk: U64, crp: U64) -> U64:
        ctx = self.ctx
        n = ctx.n
        k &= (n >> 1) - 1
        if rot_type == "left":
            gal_el = ctx.gal_el_rot_col_left[k]
        elif rot_type == "right":
            gal_el = ctx.gal_el_rot_col_right[k]
        elif rot_type == "row":
            gal_el = ctx.gal_el_rot_row
        else:
            raise ValueError(rot_type)
        return self._gen_share(sk, gal_el, crp)

    def _gen_share(self, sk: U64, gal_el: int, crp: U64) -> U64:
        """MForm(P*pi(sk)*1_block - crp*sk + e) per block
        (rotkey_gen.go:143-190)."""
        ring = self.ctx.ring_qp
        permuted = galois.permute_ntt(sk, gal_el)
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(permuted, self.ctx.ring_p.modulus_bigint)
        )
        out = []
        for i in range(self.params.beta):
            e = self._gauss_qp_ntt()
            e = self._add_block_q(e, pool, i)
            crp_i = (crp[0][i], crp[1][i])
            share = ring.mul_coeffs_montgomery_and_sub(crp_i, sk, e)
            out.append(ring.mform(share))
        return (
            jnp.stack([p[0] for p in out]),
            jnp.stack([p[1] for p in out]),
        )

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_qp.add(s1, s2)

    def finalize(self, rot_type: str, k: int, combined: U64, crp: U64, rot_keys: RotationKeys):
        """rotkey_gen.go:203-213."""
        ring = self.ctx.ring_qp
        k1 = ring.mform(crp)
        swk = SwitchingKey(combined, k1)
        k &= (self.ctx.n >> 1) - 1
        if rot_type == "left":
            rot_keys.left[k] = swk
        elif rot_type == "right":
            rot_keys.right[k] = swk
        else:
            rot_keys.row = swk


class RefreshProtocol(_Protocol):
    """Collective bootstrap: masked decrypt -> recode -> recrypt
    (dbfv/public_refresh.go)."""

    def gen_share(self, sk: U64, ct: bfv.Ciphertext, crs: U64) -> tuple[U64, U64]:
        ctx = self.ctx
        rq, rqp = ctx.ring_q, ctx.ring_qp
        nq = rq.L
        big_p = ctx.ring_p.modulus_bigint
        sk_q = (sk[0][:nq], sk[1][:nq])

        # h0 = (P*s*c1 + e)/P + Delta*mask
        h0 = rq.intt(rq.mul_coeffs_montgomery(sk_q, rq.ntt(ct.value[1])))
        h0 = rq.mul_scalar_bigint(h0, big_p)
        e = samplers.gaussian_poly(self._next_key(), rqp, 3.19, bound=19)
        e_q, e_p = self._split_qp(e)
        h0 = rq.add(h0, e_q)
        h0 = ctx.basis_q_p.mod_down_split_pq(h0, e_p)

        # h1 = (-s*crs + e')/P - Delta*mask
        t = rqp.ntt(crs)
        h1 = rqp.intt(rqp.neg(rqp.mul_coeffs_montgomery(sk, t)))
        h1 = rqp.add(h1, samplers.gaussian_poly(self._next_key(), rqp, 3.19, bound=19))
        h1 = ctx.basis_q_p.mod_down_split_pq(*self._split_qp(h1))

        mask_t = samplers.uniform_poly(self._next_key(), ctx.ring_t)
        mask = self._lift(mask_t)
        return rq.add(h0, mask), rq.sub(h1, mask)

    def _lift(self, p_t: U64) -> U64:
        """mask * floor(Q/t) per limb (dbfv/public_refresh.go:198-205)."""
        import numpy as np

        from lattigo_tpu.ops import modred

        ctx = self.ctx
        rq = ctx.ring_q
        delta = u.from_u64(
            np.array(ctx.delta_mont, dtype=np.uint64).reshape(-1, 1)
        )
        rep = (
            jnp.broadcast_to(p_t[0], (rq.L, ctx.n)),
            jnp.broadcast_to(p_t[1], (rq.L, ctx.n)),
        )
        return modred.mred(rep, delta, (rq.q_[0], rq.q_[1]), (rq.qinv_[0], rq.qinv_[1]))

    def aggregate(self, s1, s2):
        rq = self.ctx.ring_q
        return rq.add(s1[0], s2[0]), rq.add(s1[1], s2[1])

    def finalize(self, ct: bfv.Ciphertext, crs: U64, combined) -> bfv.Ciphertext:
        """Decrypt -> Recode (t/Q scale + relift) -> Recrypt
        (dbfv/public_refresh.go:170-196)."""
        ctx = self.ctx
        rq = ctx.ring_q
        h0, h1 = combined
        masked = rq.add(ct.value[0], h0)
        recoded = ctx.scaler_t.scale(masked, 1)
        recoded = self._lift((recoded[0][:1], recoded[1][:1]))
        c0 = rq.add(recoded, h1)
        c1 = ctx.basis_q_p.mod_down_split_pq(*self._split_qp(crs))
        return bfv.Ciphertext([c0, c1])
