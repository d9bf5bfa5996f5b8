"""CKKS element model (ckks/operand.go): NTT-domain polynomials carrying a
(scale, level) pair.  Level == number of carried limbs - 1 (shape-encoded);
scale is static Python metadata so jit traces specialize per scale/level —
the reference equally recompiles nothing but tracks floats per element."""

from __future__ import annotations

import dataclasses

import jax

from lattigo_tpu.ops import u64 as u

U64 = u.U64


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Ciphertext:
    value: list[U64]  # degree+1 polys, each ([lvl+1, N], [lvl+1, N])
    scale: float
    is_ntt: bool = True

    @property
    def degree(self) -> int:
        return len(self.value) - 1

    @property
    def level(self) -> int:
        return self.value[0][0].shape[-2] - 1

    def tree_flatten(self):
        return self.value, (self.scale, self.is_ntt)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), *aux)

    def copy(self) -> "Ciphertext":
        return Ciphertext(list(self.value), self.scale, self.is_ntt)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Plaintext:
    value: U64
    scale: float
    is_ntt: bool = True

    @property
    def degree(self) -> int:
        return 0

    @property
    def level(self) -> int:
        return self.value[0].shape[-2] - 1

    def tree_flatten(self):
        return (self.value,), (self.scale, self.is_ntt)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def polys_of(op) -> list[U64]:
    if isinstance(op, Plaintext):
        return [op.value]
    return op.value


def drop_to_level(x: U64, lvl: int) -> U64:
    return x[0][..., : lvl + 1, :], x[1][..., : lvl + 1, :]
