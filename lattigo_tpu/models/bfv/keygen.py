"""BFV key generation (bfv/keygen.go).

Key material lives in the QP basis, NTT domain; the secret key and switching
keys follow the reference's implicit-Montgomery convention: the uniform "a"
polynomials are read as the Montgomery form of the actual CRS, so switching
keys satisfy  evakey0 = 2^64*(e + P*skIn*1_block - a*skOut)  limb-wise
(bfv/keygen.go:285-333).

Switching keys are stored stacked as [beta, L_QP, N] U64 planes so the
key-switch inner product is one vectorized multiply-accumulate over the
decomposition axis instead of the reference's beta-step scalar loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lattigo_tpu.models.bfv.context import get_context
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
    pk: tuple[U64, U64]  # ([L_QP, N], [L_QP, N]), NTT domain

    def tree_flatten(self):
        return self.pk, ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SwitchingKey:
    key0: U64  # [beta, L_QP, N]
    key1: U64  # [beta, L_QP, N]

    def tree_flatten(self):
        return (self.key0, self.key1), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EvaluationKey:
    evakey: list[SwitchingKey]  # one per relinearized degree

    def tree_flatten(self):
        return tuple(self.evakey), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RotationKeys:
    left: dict[int, SwitchingKey] = dataclasses.field(default_factory=dict)
    right: dict[int, SwitchingKey] = dataclasses.field(default_factory=dict)
    row: SwitchingKey | None = None

    def tree_flatten(self):
        lk = tuple(sorted(self.left))
        rk = tuple(sorted(self.right))
        children = [self.left[k] for k in lk] + [self.right[k] for k in rk]
        if self.row is not None:
            children.append(self.row)
        return tuple(children), (lk, rk, self.row is not None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        lk, rk, has_row = aux
        children = list(children)
        left = {k: children.pop(0) for k in lk}
        right = {k: children.pop(0) for k in rk}
        row = children.pop(0) if has_row else None
        return cls(left, right, row)


class KeyGenerator:
    """bfv/keygen.go:8-17; takes an explicit jax.random key for determinism."""

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
        sk = ring.ntt(samplers.ternary_poly(self._next_key(), ring, p=p, montgomery=True))
        return SecretKey(sk)

    def gen_secret_key_sparse(self, hw: int) -> SecretKey:
        ring = self.ctx.ring_qp
        sk = ring.ntt(
            samplers.ternary_sparse_poly(self._next_key(), ring, hw, montgomery=True)
        )
        return SecretKey(sk)

    def gen_public_key(self, sk: SecretKey) -> PublicKey:
        """pk = (-(a*s + e), a) in QP, NTT domain (bfv/keygen.go:121-136)."""
        ring = self.ctx.ring_qp
        e = ring.ntt(samplers.gaussian_poly(self._next_key(), ring, self.params.sigma))
        a = samplers.uniform_poly(self._next_key(), ring)
        pk0 = ring.neg(ring.mul_coeffs_montgomery_and_add(sk.sk, a, e))
        return PublicKey((pk0, a))

    def gen_key_pair(self) -> tuple[SecretKey, PublicKey]:
        sk = self.gen_secret_key()
        return sk, self.gen_public_key(sk)

    def gen_relin_key(self, sk: SecretKey, max_degree: int = 1) -> EvaluationKey:
        """Keys for s^2..s^(maxDegree+1) -> s (bfv/keygen.go:172-196)."""
        ring = self.ctx.ring_qp
        assert self.ctx.ring_p is not None, "modulus P is empty"
        pool = ring.mul_scalar_bigint(sk.sk, self.ctx.ring_p.modulus_bigint)
        keys = []
        for _ in range(max_degree):
            pool = ring.mul_coeffs_montgomery(pool, sk.sk)
            keys.append(self._new_switching_key(pool, sk.sk))
        return EvaluationKey(keys)

    def gen_switching_key(self, sk_in: SecretKey, sk_out: SecretKey) -> SwitchingKey:
        ring = self.ctx.ring_qp
        pool = ring.mul_scalar_bigint(sk_in.sk, self.ctx.ring_p.modulus_bigint)
        return self._new_switching_key(pool, sk_out.sk)

    def _new_switching_key(self, sk_in_scaled: U64, sk_out: U64) -> SwitchingKey:
        """bfv/keygen.go:285-333.  sk_in_scaled = P * skIn (Montgomery, NTT).

        Deviation from the reference: when alpha does not divide #Qi, the
        reference's block loop can add skIn onto a P limb
        (bfv/keygen.go:313-318, dead code for all default params); here
        blocks are always restricted to Q limbs, which is the correct
        decomposition.
        """
        ring = self.ctx.ring_qp
        params = self.params
        n_q = len(params.qi)
        L = ring.L
        k0_planes, k1_planes = [], []
        for i in range(params.beta):
            e = ring.mform(
                ring.ntt(samplers.gaussian_poly(self._next_key(), ring, params.sigma))
            )
            a = samplers.uniform_poly(self._next_key(), ring)
            # add P*skIn on the block's Q limbs only
            start = i * params.alpha
            end = min(start + params.alpha, n_q)
            mask = jnp.zeros((L, 1), dtype=bool).at[start:end].set(True)
            bumped = ring.add(e, sk_in_scaled)
            e = u.select64(mask, bumped, e)
            k0 = ring.mul_coeffs_montgomery_and_sub(a, sk_out, e)
            k0_planes.append(k0)
            k1_planes.append(a)
        stack = lambda ps: (
            jnp.stack([p[0] for p in ps]),
            jnp.stack([p[1] for p in ps]),
        )
        return SwitchingKey(stack(k0_planes), stack(k1_planes))

    def gen_rot(self, rot_type: str, sk: SecretKey, k: int, rot_keys: RotationKeys):
        """bfv/keygen.go:342-369."""
        n = self.ctx.n
        k &= (n >> 1) - 1
        if rot_type == "left":
            if k != 0 and k not in rot_keys.left:
                rot_keys.left[k] = self._gen_rot_key(
                    sk, self.ctx.gal_el_rot_col_left[k]
                )
        elif rot_type == "right":
            if k != 0 and k not in rot_keys.right:
                rot_keys.right[k] = self._gen_rot_key(
                    sk, self.ctx.gal_el_rot_col_right[k]
                )
        elif rot_type == "row":
            rot_keys.row = self._gen_rot_key(sk, self.ctx.gal_el_rot_row)
        else:
            raise ValueError(rot_type)

    def gen_rotation_keys_pow2(self, sk: SecretKey) -> RotationKeys:
        """All power-of-two left/right rotations + row swap
        (bfv/keygen.go:372-388)."""
        rk = RotationKeys()
        n = self.ctx.n
        i = 1
        while i < n >> 1:
            rk.left[i] = self._gen_rot_key(sk, self.ctx.gal_el_rot_col_left[i])
            rk.right[i] = self._gen_rot_key(sk, self.ctx.gal_el_rot_col_right[i])
            i <<= 1
        rk.row = self._gen_rot_key(sk, self.ctx.gal_el_rot_row)
        return rk

    def _gen_rot_key(self, sk: SecretKey, gal_el: int) -> SwitchingKey:
        """genrotkey (bfv/keygen.go:429-441): skIn = pi_galois(sk)."""
        ring = self.ctx.ring_qp
        permuted = galois.permute_ntt(sk.sk, gal_el)
        pool = ring.mul_scalar_bigint(permuted, self.ctx.ring_p.modulus_bigint)
        return self._new_switching_key(pool, sk.sk)
