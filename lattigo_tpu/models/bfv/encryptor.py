"""BFV encryption/decryption (bfv/encryptor.go, bfv/decryptor.go)."""

from __future__ import annotations

import jax

from lattigo_tpu.models.bfv.context import get_context
from lattigo_tpu.models.bfv.elements import Ciphertext, Plaintext
from lattigo_tpu.ops import samplers
from lattigo_tpu.ops import u64 as u

U64 = u.U64


def _split_qp(ctx, x: U64) -> tuple[U64, U64]:
    nq = ctx.ring_q.L
    return (x[0][:nq], x[1][:nq]), (x[0][nq:], x[1][nq:])


class Encryptor:
    """pk path: ct = (pk0*u + e0 + m, pk1*u + e1), sampled in QP then divided
    by P via ModDown (bfv/encryptor.go:169-223); fast path samples in Q."""

    def __init__(self, params, pk=None, sk=None, rng_key=None):
        assert (pk is None) != (sk is None), "provide exactly one of pk/sk"
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
        """sk path with an externally provided uniform polynomial (MPC CRS)."""
        assert self.sk is not None, "CRP encryption requires a secret key"
        return self._encrypt_sk(pt, crp=crp, fast=fast)

    def _encrypt_pk(self, pt: Plaintext, fast: bool) -> Ciphertext:
        ctx = self.ctx
        ring = ctx.ring_q if fast else ctx.ring_qp
        nq = ctx.ring_q.L
        pk0, pk1 = self.pk.pk
        if fast:
            pk0 = (pk0[0][:nq], pk0[1][:nq])
            pk1 = (pk1[0][:nq], pk1[1][:nq])

        uu = ring.ntt(samplers.ternary_poly(self._next_key(), ring, p=0.5, montgomery=True))
        c0 = ring.intt(ring.mul_coeffs_montgomery(uu, pk0))
        c1 = ring.intt(ring.mul_coeffs_montgomery(uu, pk1))
        c0 = ring.add(c0, samplers.gaussian_poly(self._next_key(), ring, self.params.sigma))
        c1 = ring.add(c1, samplers.gaussian_poly(self._next_key(), ring, self.params.sigma))

        if not fast:
            bx = ctx.basis_q_p
            c0q, c0p = _split_qp(ctx, c0)
            c1q, c1p = _split_qp(ctx, c1)
            c0 = bx.mod_down_split_pq(c0q, c0p)
            c1 = bx.mod_down_split_pq(c1q, c1p)

        c0 = ctx.ring_q.add(c0, pt.value)
        return Ciphertext([c0, c1])

    def _encrypt_sk(self, pt: Plaintext, crp: U64 | None, fast: bool) -> Ciphertext:
        """ct = (-a*s + e + m, a) (bfv/encryptor.go:306-345)."""
        ctx = self.ctx
        ring = ctx.ring_q if fast else ctx.ring_qp
        nq = ctx.ring_q.L
        if crp is None:
            a = samplers.uniform_poly(self._next_key(), ring)
        else:
            a = crp
        sk = self.sk.sk
        if fast:
            sk = (sk[0][:nq], sk[1][:nq])
        c0 = ring.neg(ring.mul_coeffs_montgomery(a, sk))
        c0 = ring.intt(c0)
        a_coeff = ring.intt(a)
        c0 = ring.add(c0, samplers.gaussian_poly(self._next_key(), ring, self.params.sigma))
        if not fast:
            bx = ctx.basis_q_p
            c0q, c0p = _split_qp(ctx, c0)
            aq, ap = _split_qp(ctx, a_coeff)
            c0 = bx.mod_down_split_pq(c0q, c0p)
            a_coeff = bx.mod_down_split_pq(aq, ap)
        c0 = ctx.ring_q.add(c0, pt.value)
        return Ciphertext([c0, a_coeff])


class Decryptor:
    """NTT-domain Horner over the ciphertext degree (bfv/decryptor.go:55-73)."""

    def __init__(self, params, sk):
        self.ctx = get_context(params)
        self.sk = sk

    def decrypt(self, ct: Ciphertext) -> Plaintext:
        ring = self.ctx.ring_q
        nq = ring.L
        sk = (self.sk.sk[0][:nq], self.sk.sk[1][:nq])
        acc = ring.ntt(ct.value[ct.degree])
        for i in range(ct.degree, 0, -1):
            acc = ring.mul_coeffs_montgomery(acc, sk)
            acc = ring.add(acc, ring.ntt(ct.value[i - 1]))
        return Plaintext(ring.intt(ring.reduce(acc)))
