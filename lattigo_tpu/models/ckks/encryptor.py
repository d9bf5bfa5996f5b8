"""CKKS encryption/decryption (ckks/encryptor.go, ckks/decryptor.go).
Ciphertexts live permanently in the NTT domain."""

from __future__ import annotations

import jax

from lattigo_tpu.models.ckks.context import get_context
from lattigo_tpu.models.ckks.elements import Ciphertext, Plaintext, drop_to_level
from lattigo_tpu.ops import samplers
from lattigo_tpu.ops import u64 as u

U64 = u.U64


class Encryptor:
    def __init__(self, params, pk=None, sk=None, rng_key=None):
        assert (pk is None) != (sk is None)
        self.ctx = get_context(params)
        self.params = self.ctx.params
        self.pk = pk
        self.sk = sk
        self._key = rng_key if rng_key is not None else jax.random.key(42)
        self._n_used = 0

    def _next_key(self):
        self._n_used += 1
        return jax.random.fold_in(self._key, self._n_used)

    def encrypt(self, pt: Plaintext, fast: bool = False) -> Ciphertext:
        if self.pk is not None:
            return self._encrypt_pk(pt, fast)
        return self._encrypt_sk(pt, crp=None, fast=fast)

    def encrypt_from_crp(self, pt: Plaintext, crp: U64, fast: bool = False) -> Ciphertext:
        assert self.sk is not None
        return self._encrypt_sk(pt, crp=crp, fast=fast)

    def _encrypt_pk(self, pt: Plaintext, fast: bool) -> Ciphertext:
        """ckks/encryptor.go:179-237."""
        ctx = self.ctx
        lvl = pt.level
        nq = ctx.ring_q.L
        sigma = self.params.sigma
        if fast:
            ring = ctx.ring_q
            pk0 = drop_to_level(self.pk.pk[0], nq - 1)
            pk1 = drop_to_level(self.pk.pk[1], nq - 1)
            uu = ring.ntt(samplers.ternary_poly(self._next_key(), ring, 0.5, montgomery=True))
            c0 = ring.mul_coeffs_montgomery(uu, pk0)
            c1 = ring.mul_coeffs_montgomery(uu, pk1)
            c0 = ring.add(c0, ring.ntt(samplers.gaussian_poly(self._next_key(), ring, sigma)))
            c1 = ring.add(c1, ring.ntt(samplers.gaussian_poly(self._next_key(), ring, sigma)))
            c0 = drop_to_level(c0, lvl)
            c1 = drop_to_level(c1, lvl)
        else:
            ring = ctx.ring_qp
            uu = ring.ntt(samplers.ternary_poly(self._next_key(), ring, 0.5, montgomery=True))
            c0 = ring.intt(ring.mul_coeffs_montgomery(uu, self.pk.pk[0]))
            c1 = ring.intt(ring.mul_coeffs_montgomery(uu, self.pk.pk[1]))
            c0 = ring.add(c0, samplers.gaussian_poly(self._next_key(), ring, sigma))
            c1 = ring.add(c1, samplers.gaussian_poly(self._next_key(), ring, sigma))
            bx = ctx.basis_q_p
            split = lambda x: (drop_to_level(x, lvl) if False else None)
            c0q = (c0[0][:lvl + 1], c0[1][:lvl + 1])
            c0p = (c0[0][nq:], c0[1][nq:])
            c1q = (c1[0][:lvl + 1], c1[1][:lvl + 1])
            c1p = (c1[0][nq:], c1[1][nq:])
            c0 = ctx.ring_q.ntt(bx.mod_down_split_pq(c0q, c0p))
            c1 = ctx.ring_q.ntt(bx.mod_down_split_pq(c1q, c1p))
        c0 = ctx.ring_q.add(c0, pt.value)
        return Ciphertext([c0, c1], pt.scale)

    def _encrypt_sk(self, pt: Plaintext, crp: U64 | None, fast: bool) -> Ciphertext:
        ctx = self.ctx
        lvl = pt.level
        nq = ctx.ring_q.L
        sigma = self.params.sigma
        ring = ctx.ring_q if fast else ctx.ring_qp
        if crp is None:
            a = samplers.uniform_poly(self._next_key(), ring)
        else:
            a = crp
        sk = self.sk.sk if not fast else drop_to_level(self.sk.sk, nq - 1)
        c0 = ring.neg(ring.mul_coeffs_montgomery(a, sk))
        if fast:
            e = ring.ntt(samplers.gaussian_poly(self._next_key(), ring, sigma))
            c0 = ring.add(c0, e)
            c0, c1 = drop_to_level(c0, lvl), drop_to_level(a, lvl)
        else:
            c0 = ring.intt(c0)
            a_coeff = ring.intt(a)
            c0 = ring.add(c0, samplers.gaussian_poly(self._next_key(), ring, sigma))
            bx = ctx.basis_q_p
            c0q, c0p = (c0[0][: lvl + 1], c0[1][: lvl + 1]), (c0[0][nq:], c0[1][nq:])
            aq, ap = (a_coeff[0][: lvl + 1], a_coeff[1][: lvl + 1]), (
                a_coeff[0][nq:],
                a_coeff[1][nq:],
            )
            c0 = ctx.ring_q.ntt(bx.mod_down_split_pq(c0q, c0p))
            c1 = ctx.ring_q.ntt(bx.mod_down_split_pq(aq, ap))
        c0 = ctx.ring_q.add(c0, pt.value)
        return Ciphertext([c0, c1], pt.scale)


class Decryptor:
    """NTT-domain Horner (ckks/decryptor.go:53-79)."""

    def __init__(self, params, sk):
        self.ctx = get_context(params)
        self.sk = sk

    def decrypt(self, ct: Ciphertext) -> Plaintext:
        ring = self.ctx.ring_q
        lvl = ct.level
        sk = drop_to_level(self.sk.sk, lvl)
        acc = ct.value[ct.degree]
        for i in range(ct.degree, 0, -1):
            acc = ring.mul_coeffs_montgomery(acc, sk)
            acc = ring.add(acc, ct.value[i - 1])
        return Plaintext(ring.reduce(acc), ct.scale)
