"""Distributed (threshold) CKKS protocols (dckks/).

Same four-phase protocol shapes as dbfv, but level-aware and NTT-domain
(ciphertexts live in NTT form), and the collective Refresh restores both the
noise budget AND the level (dckks/public_refresh.go:109-140 Recode)."""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from lattigo_tpu.models import ckks
from lattigo_tpu.models.ckks.elements import drop_to_level
from lattigo_tpu.models.ckks.keygen import (
    EvaluationKey,
    PublicKey,
    RotationKeys,
    SwitchingKey,
)
from lattigo_tpu.ops import basis_ext, galois, samplers
from lattigo_tpu.ops import u64 as u

U64 = u.U64


class _Protocol:
    def __init__(self, params, rng_key=None, label: int = 0):
        self.ctx = ckks.get_context(params)
        self.params = self.ctx.params
        self._key = (
            rng_key if rng_key is not None else jax.random.key(2000 + label)
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
        nq = self.ctx.ring_q.L
        top = nq if lvl is None else lvl + 1
        return (x[0][:top], x[1][:top]), (x[0][nq:], x[1][nq:])

    def _add_block_q(self, e: U64, sk_scaled: U64, block: int) -> U64:
        ring = self.ctx.ring_qp
        n_q = len(self.params.qi)
        start = block * self.params.alpha
        end = min(start + self.params.alpha, n_q)
        mask = jnp.zeros((ring.L, 1), dtype=bool).at[start:end].set(True)
        return u.select64(mask, ring.add(e, sk_scaled), e)

    def _stack(self, polys):
        return (
            jnp.stack([p[0] for p in polys]),
            jnp.stack([p[1] for p in polys]),
        )


class CKGProtocol(_Protocol):
    """Collective public key (dckks/publickey_gen.go)."""

    def gen_share(self, sk: U64, crp: U64) -> U64:
        ring = self.ctx.ring_qp
        return ring.mul_coeffs_montgomery_and_sub(sk, crp, self._gauss_qp_ntt())

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_qp.add(s1, s2)

    def gen_public_key(self, combined: U64, crp: U64) -> PublicKey:
        return PublicKey((combined, crp))


class CKSProtocol(_Protocol):
    """Collective key switch, NTT-domain and level-aware
    (dckks/keyswitching.go)."""

    def __init__(self, params, sigma_smudging: float = 6.36, **kw):
        # default smudging noise matches the reference tests
        # (dbfv/dbfv_test.go:355,409: 6.36)
        super().__init__(params, **kw)
        self.sigma_smudging = sigma_smudging

    def gen_share(self, sk_in: U64, sk_out: U64, ct: ckks.Ciphertext) -> U64:
        ctx = self.ctx
        rq = ctx.ring_q
        lvl = ct.level
        delta = rq.sub(drop_to_level(sk_in, lvl), drop_to_level(sk_out, lvl))
        share = rq.mul_coeffs_montgomery(ct.value[1], delta)
        share = rq.mul_scalar_bigint(share, ctx.ring_p.modulus_bigint)
        e = self.ctx.ring_qp.ntt(
            samplers.gaussian_poly(self._next_key(), self.ctx.ring_qp, self.sigma_smudging)
        )
        e_q, e_p = self._split_qp(e, lvl)
        share = rq.add(share, e_q)
        return ctx.basis_q_p.mod_down_split_ntt_pq(share, e_p)

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_q.add(s1, s2)

    def key_switch(self, combined: U64, ct: ckks.Ciphertext) -> ckks.Ciphertext:
        return ckks.Ciphertext(
            [self.ctx.ring_q.add(ct.value[0], combined), ct.value[1]], ct.scale
        )


class PCKSProtocol(_Protocol):
    """Public-key collective key switch (dckks/public_keyswitching.go)."""

    def __init__(self, params, sigma_smudging: float = 6.36, **kw):
        # default smudging noise matches the reference tests
        # (dbfv/dbfv_test.go:355,409: 6.36)
        super().__init__(params, **kw)
        self.sigma_smudging = sigma_smudging

    def gen_share(self, sk: U64, pk: PublicKey, ct: ckks.Ciphertext) -> tuple[U64, U64]:
        ctx = self.ctx
        rqp, rq = ctx.ring_qp, ctx.ring_q
        lvl = ct.level
        uu = rqp.ntt(
            samplers.ternary_poly(self._next_key(), rqp, 0.5, montgomery=True)
        )
        h0 = rqp.mul_coeffs_montgomery(uu, pk.pk[0])
        h1 = rqp.mul_coeffs_montgomery(uu, pk.pk[1])
        h0 = rqp.add(h0, self._gauss_qp_ntt(self.sigma_smudging))
        h1 = rqp.add(h1, self._gauss_qp_ntt())
        bx = ctx.basis_q_p
        s0 = bx.mod_down_split_ntt_pq(*self._split_qp(h0, lvl))
        s1 = bx.mod_down_split_ntt_pq(*self._split_qp(h1, lvl))
        sk_lvl = drop_to_level(sk, lvl)
        s0 = rq.add(s0, rq.mul_coeffs_montgomery(ct.value[1], sk_lvl))
        return s0, s1

    def aggregate(self, s1, s2):
        rq = self.ctx.ring_q
        return rq.add(s1[0], s2[0]), rq.add(s1[1], s2[1])

    def key_switch(self, combined, ct: ckks.Ciphertext) -> ckks.Ciphertext:
        return ckks.Ciphertext(
            [self.ctx.ring_q.add(ct.value[0], combined[0]), combined[1]],
            ct.scale,
        )


class RKGProtocol(_Protocol):
    """3-round collective relinearization key (dckks/relinkey_gen.go)."""

    def new_ephemeral_key(self, p: float = 1.0 / 3.0) -> U64:
        ring = self.ctx.ring_qp
        return ring.ntt(
            samplers.ternary_poly(self._next_key(), ring, p=p, montgomery=True)
        )

    def _unstack(self, stacked, i):
        return stacked[0][i], stacked[1][i]

    def gen_share_round_one(self, u_eph: U64, sk: U64, crp: U64) -> U64:
        ring = self.ctx.ring_qp
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(sk, self.ctx.ring_p.modulus_bigint)
        )
        out = []
        for i in range(self.params.beta()):
            e = self._gauss_qp_ntt()
            e = self._add_block_q(e, pool, i)
            out.append(
                ring.mul_coeffs_montgomery_and_sub(u_eph, self._unstack(crp, i), e)
            )
        return self._stack(out)

    def gen_share_round_two(self, round1: U64, sk: U64, crp: U64):
        ring = self.ctx.ring_qp
        o0, o1 = [], []
        for i in range(self.params.beta()):
            t0 = ring.mul_coeffs_montgomery(self._unstack(round1, i), sk)
            o0.append(ring.add(t0, self._gauss_qp_ntt()))
            e2 = self._gauss_qp_ntt()
            o1.append(
                ring.mul_coeffs_montgomery_and_add(sk, self._unstack(crp, i), e2)
            )
        return self._stack(o0), self._stack(o1)

    def gen_share_round_three(self, round2, u_eph: U64, sk: U64) -> U64:
        ring = self.ctx.ring_qp
        diff = ring.sub(u_eph, sk)
        out = []
        for i in range(self.params.beta()):
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
        ring = self.ctx.ring_qp
        k0 = ring.mform(ring.add(round2[0], round3))
        k1 = ring.mform(round2[1])
        return EvaluationKey(SwitchingKey(k0, k1))


class RKGProtocolNaive(_Protocol):
    """2-round relinearization-key protocol via pseudo-encryptions under the
    collective public key (dckks/relinkey_gen_naive.go:9-199) — the max-level
    mirror of dbfv's naive protocol."""

    def gen_share_round_one(self, sk: U64, pk: PublicKey) -> tuple[U64, U64]:
        """(cpk0*u + P*sk*1_block + e0, cpk1*u + e1) per decomposition block.

        Deliberate divergence: dckks/relinkey_gen_naive.go:73-75 samples e1
        into shareOut[i][0] (overwriting e0) and leaves h1 noiseless; this
        implementation samples e0 and e1 into their own halves, which is the
        cryptographically intended behavior the reference's tests tolerate."""
        ring = self.ctx.ring_qp
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(sk, self.ctx.ring_p.modulus_bigint)
        )
        o0, o1 = [], []
        for i in range(self.params.beta()):
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
        for i in range(self.params.beta()):
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
            SwitchingKey(ring.mform(round2[0]), ring.mform(round2[1]))
        )


class RTGProtocol(_Protocol):
    """Collective rotation keys, + conjugation (dckks/rotkey_gen.go)."""

    def gen_share(self, rot_type: str, k: int, sk: U64, crp: U64) -> U64:
        ctx = self.ctx
        n = ctx.n
        k &= (n >> 1) - 1
        gal_el = {
            "left": lambda: ctx.gal_el_rot_col_left[k],
            "right": lambda: ctx.gal_el_rot_col_right[k],
            "conjugate": lambda: ctx.gal_el_conjugate,
        }[rot_type]()
        ring = ctx.ring_qp
        permuted = galois.permute_ntt(sk, gal_el)
        pool = ring.inv_mform(
            ring.mul_scalar_bigint(permuted, ctx.ring_p.modulus_bigint)
        )
        out = []
        for i in range(self.params.beta()):
            e = self._gauss_qp_ntt()
            e = self._add_block_q(e, pool, i)
            crp_i = (crp[0][i], crp[1][i])
            out.append(ring.mform(ring.mul_coeffs_montgomery_and_sub(crp_i, sk, e)))
        return self._stack(out)

    def aggregate(self, s1: U64, s2: U64) -> U64:
        return self.ctx.ring_qp.add(s1, s2)

    def finalize(self, rot_type: str, k: int, combined: U64, crp: U64, rot_keys: RotationKeys):
        ring = self.ctx.ring_qp
        swk = SwitchingKey(combined, ring.mform(crp))
        k &= (self.ctx.n >> 1) - 1
        if rot_type == "left":
            rot_keys.left[k] = swk
        elif rot_type == "right":
            rot_keys.right[k] = swk
        else:
            rot_keys.conjugate = swk


class RefreshProtocol(_Protocol):
    """Collective bootstrap: restores noise budget AND level
    (dckks/public_refresh.go)."""

    def _uniform_bigint_vec(self, bound: int) -> np.ndarray:
        """N uniform big-ints in [0, bound), derived from the protocol's
        jax.random key chain (same explicit-key discipline as every other
        sampler) and recombined via vectorized object arithmetic."""
        n_words = (bound.bit_length() + 64 + 31) // 32
        words = np.asarray(
            jax.random.bits(self._next_key(), (n_words, self.ctx.n), dtype=jnp.uint32)
        )
        acc = np.zeros(self.ctx.n, dtype=object)
        for w in range(n_words):
            acc += words[w].astype(object) << (32 * w)
        return acc % bound

    def gen_mask_planes(self, n_parties: int, lvl: int) -> tuple[U64, U64]:
        """Host-side phase: one party's big-int smudging mask, bounded by
        Q_lvl/(2*n_parties) (dckks/public_refresh.go:49-64), returned as RNS
        planes at the ct level and at max level.  Split out from gen_shares
        so the remaining (traceable) share math can run under shard_map on a
        party mesh."""
        rq = self.ctx.ring_q
        bound = 1
        for q in rq.moduli[: lvl + 1]:
            bound *= q
        bound //= 2 * n_parties
        half = bound >> 1
        r = self._uniform_bigint_vec(bound)
        mask = np.where(r >= half, r - bound, r)
        return rq.set_coeffs_bigint(mask, lvl), rq.set_coeffs_bigint(mask)

    def gen_share_masked(
        self, sk: U64, ct_c1: U64, crs: U64, mask_lvl: U64, mask_full: U64
    ) -> tuple[U64, U64]:
        """Traceable phase of gen_shares: everything after the host big-int
        mask build (dckks/public_refresh.go:66-96)."""
        rq = self.ctx.ring_q
        lvl = rq.level_of(mask_lvl)
        h0 = rq.ntt(mask_lvl)
        h1 = rq.ntt(mask_full)
        sk_lvl = drop_to_level(sk, lvl)
        sk_q = drop_to_level(sk, rq.L - 1)
        h0 = rq.add(h0, rq.mul_coeffs_montgomery(sk_lvl, ct_c1))
        h1 = rq.add(h1, rq.mul_coeffs_montgomery(sk_q, crs))
        e0 = rq.ntt(
            drop_to_level(samplers.gaussian_poly(self._next_key(), rq, 3.19), lvl)
        )
        h0 = rq.add(h0, e0)
        e1 = rq.ntt(samplers.gaussian_poly(self._next_key(), rq, 3.19))
        h1 = rq.neg(rq.add(h1, e1))
        return h0, h1

    def gen_shares(
        self, sk: U64, n_parties: int, ct: ckks.Ciphertext, crs: U64
    ) -> tuple[U64, U64]:
        """(h0 at ct level, h1 at max level) (dckks/public_refresh.go:44-96)."""
        mask_lvl, mask_full = self.gen_mask_planes(n_parties, ct.level)
        return self.gen_share_masked(sk, ct.value[1], crs, mask_lvl, mask_full)

    def aggregate(self, s1, s2):
        rq = self.ctx.ring_q
        return rq.add(s1[0], s2[0]), rq.add(s1[1], s2[1])

    def _recode_params(self, lvl: int):
        """Cached ModUpParams for the centered Q[:lvl+1] -> Q[lvl+1:]
        re-expansion of finalize."""
        if not hasattr(self, "_cache"):
            self._cache = {}
        key = ("recode", lvl)
        if key not in self._cache:
            rq = self.ctx.ring_q
            self._cache[key] = basis_ext.ModUpParams(
                rq.moduli[: lvl + 1], rq.moduli[lvl + 1 :]
            )
        return self._cache[key]

    def finalize(self, ct: ckks.Ciphertext, crs: U64, combined) -> ckks.Ciphertext:
        """Decrypt -> Recode (centered CRT re-expand at max level) -> Recrypt
        (dckks/public_refresh.go:102-151).

        The reference centers through host big.Int; here the centered lift
        runs as one device basis extension (mod_up(centered=True)): limbs
        <= lvl keep their residues unchanged (Q_lvl = 0 mod q_i), and the
        upper limbs receive x - Q_lvl*[x >= Q_lvl/2] mod q_j directly."""
        ctx = self.ctx
        rq = ctx.ring_q
        h0, h1 = combined
        lvl = ct.level
        masked = rq.intt(rq.add(ct.value[0], h0))
        if lvl + 1 < rq.L:
            upper = basis_ext.mod_up(
                masked, self._recode_params(lvl), centered=True
            )
            full = (
                jnp.concatenate([masked[0], upper[0]], axis=-2),
                jnp.concatenate([masked[1], upper[1]], axis=-2),
            )
        else:
            full = masked
        c0 = rq.add(rq.ntt(full), h1)
        return ckks.Ciphertext([c0, crs], ct.scale)

    def finalize_bigint(self, ct: ckks.Ciphertext, crs: U64, combined) -> ckks.Ciphertext:
        """Host big-int twin of finalize (the reference's exact path,
        dckks/public_refresh.go:102-151) — kept as the test oracle for the
        device recode."""
        ctx = self.ctx
        rq = ctx.ring_q
        h0, h1 = combined
        lvl = ct.level
        masked = rq.add(ct.value[0], h0)
        coeffs = rq.poly_to_bigint_vec(rq.intt(masked))
        q_start = 1
        for q in rq.moduli[: lvl + 1]:
            q_start *= q
        q_half = q_start >> 1
        centered = np.where(coeffs >= q_half, coeffs - q_start, coeffs)
        c0 = rq.ntt(rq.set_coeffs_bigint(centered))
        c0 = rq.add(c0, h1)
        return ckks.Ciphertext([c0, crs], ct.scale)
