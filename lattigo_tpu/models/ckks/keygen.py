"""CKKS key generation (ckks/keygen.go).

Same stacked-key layout as the BFV generator; adds sparse secret keys and
conjugation keys.  Switching-key blocks are restricted to Q limbs
(ckks/keygen.go:282-333)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lattigo_tpu.models.ckks.context import get_context
from lattigo_tpu.ops import galois, samplers
from lattigo_tpu.ops import u64 as u

U64 = u.U64


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SecretKey:
    sk: U64  # [L_QP, N], NTT + Montgomery

    def tree_flatten(self):
        return (self.sk,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PublicKey:
    pk: tuple[U64, U64]

    def tree_flatten(self):
        return self.pk, ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SwitchingKey:
    key0: U64  # [beta, L_QP, N]
    key1: U64

    def tree_flatten(self):
        return (self.key0, self.key1), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EvaluationKey:
    evakey: SwitchingKey  # relinearization s^2 -> s

    def tree_flatten(self):
        return (self.evakey,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RotationKeys:
    left: dict[int, SwitchingKey] = dataclasses.field(default_factory=dict)
    right: dict[int, SwitchingKey] = dataclasses.field(default_factory=dict)
    conjugate: SwitchingKey | None = None

    def tree_flatten(self):
        lk = tuple(sorted(self.left))
        rk = tuple(sorted(self.right))
        children = [self.left[k] for k in lk] + [self.right[k] for k in rk]
        if self.conjugate is not None:
            children.append(self.conjugate)
        return tuple(children), (lk, rk, self.conjugate is not None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        lk, rk, has_conj = aux
        children = list(children)
        left = {k: children.pop(0) for k in lk}
        right = {k: children.pop(0) for k in rk}
        conj = children.pop(0) if has_conj else None
        return cls(left, right, conj)


class KeyGenerator:
    def __init__(self, params, rng_key=None):
        self.ctx = get_context(params)
        self.params = self.ctx.params
        self._key = rng_key if rng_key is not None else jax.random.key(0)
        self._n_used = 0

    def _next_key(self):
        self._n_used += 1
        return jax.random.fold_in(self._key, self._n_used)

    def gen_secret_key(self, p: float = 1.0 / 3.0) -> SecretKey:
        ring = self.ctx.ring_qp
        return SecretKey(
            ring.ntt(samplers.ternary_poly(self._next_key(), ring, p=p, montgomery=True))
        )

    def gen_secret_key_sparse(self, hw: int) -> SecretKey:
        """hw nonzero +-1 coefficients (ckks/keygen.go:110-114)."""
        ring = self.ctx.ring_qp
        return SecretKey(
            ring.ntt(
                samplers.ternary_sparse_poly(self._next_key(), ring, hw, montgomery=True)
            )
        )

    def gen_public_key(self, sk: SecretKey) -> PublicKey:
        ring = self.ctx.ring_qp
        e = ring.ntt(samplers.gaussian_poly(self._next_key(), ring, self.params.sigma))
        a = samplers.uniform_poly(self._next_key(), ring)
        pk0 = ring.neg(ring.mul_coeffs_montgomery_and_add(sk.sk, a, e))
        return PublicKey((pk0, a))

    def gen_key_pair(self) -> tuple[SecretKey, PublicKey]:
        sk = self.gen_secret_key()
        return sk, self.gen_public_key(sk)

    def gen_key_pair_sparse(self, hw: int) -> tuple[SecretKey, PublicKey]:
        sk = self.gen_secret_key_sparse(hw)
        return sk, self.gen_public_key(sk)

    def gen_relin_key(self, sk: SecretKey) -> EvaluationKey:
        ring = self.ctx.ring_qp
        sk2 = ring.mul_coeffs_montgomery(sk.sk, sk.sk)
        return EvaluationKey(self._new_switching_key(sk2, sk.sk))

    def gen_switching_key(self, sk_in: SecretKey, sk_out: SecretKey) -> SwitchingKey:
        return self._new_switching_key(sk_in.sk, sk_out.sk)

    def _new_switching_key(self, sk_in: U64, sk_out: U64) -> SwitchingKey:
        """evakey_i = 2^64*(e + P*skIn*1_block - a*skOut)
        (ckks/keygen.go:282-333; blocks limited to Q limbs)."""
        ring = self.ctx.ring_qp
        params = self.params
        sk_in_scaled = ring.mul_scalar_bigint(sk_in, self.ctx.ring_p.modulus_bigint)
        n_q = len(params.qi)
        alpha = params.alpha
        beta = params.beta()
        k0s, k1s = [], []
        for i in range(beta):
            e = ring.mform(
                ring.ntt(samplers.gaussian_poly(self._next_key(), ring, params.sigma))
            )
            a = samplers.uniform_poly(self._next_key(), ring)
            start = i * alpha
            end = min(start + alpha, n_q)
            mask = jnp.zeros((ring.L, 1), dtype=bool).at[start:end].set(True)
            e = u.select64(mask, ring.add(e, sk_in_scaled), e)
            k0s.append(ring.mul_coeffs_montgomery_and_sub(a, sk_out, e))
            k1s.append(a)
        stack = lambda ps: (
            jnp.stack([p[0] for p in ps]),
            jnp.stack([p[1] for p in ps]),
        )
        return SwitchingKey(stack(k0s), stack(k1s))

    def gen_rot(self, rot_type: str, sk: SecretKey, k: int, rot_keys: RotationKeys):
        n = self.ctx.n
        k &= (n >> 1) - 1
        if rot_type == "left":
            if k != 0 and k not in rot_keys.left:
                rot_keys.left[k] = self._gen_rot_key(sk, self.ctx.gal_el_rot_col_left[k])
        elif rot_type == "right":
            if k != 0 and k not in rot_keys.right:
                rot_keys.right[k] = self._gen_rot_key(
                    sk, self.ctx.gal_el_rot_col_right[k]
                )
        elif rot_type == "conjugate":
            rot_keys.conjugate = self._gen_rot_key(sk, self.ctx.gal_el_conjugate)
        else:
            raise ValueError(rot_type)

    def gen_rotation_keys_pow2(self, sk: SecretKey, conjugate: bool = True) -> RotationKeys:
        rk = RotationKeys()
        n = self.ctx.n
        i = 1
        while i < n >> 1:
            rk.left[i] = self._gen_rot_key(sk, self.ctx.gal_el_rot_col_left[i])
            rk.right[i] = self._gen_rot_key(sk, self.ctx.gal_el_rot_col_right[i])
            i <<= 1
        if conjugate:
            rk.conjugate = self._gen_rot_key(sk, self.ctx.gal_el_conjugate)
        return rk

    def _gen_rot_key(self, sk: SecretKey, gal_el: int) -> SwitchingKey:
        permuted = galois.permute_ntt(sk.sk, gal_el)
        return self._new_switching_key(permuted, sk.sk)
