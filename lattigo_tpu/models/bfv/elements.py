"""BFV element model: degree-d ciphertexts and degree-0 plaintexts
(bfv/operand.go, bfv/ciphertext.go, bfv/plaintext.go).

A ciphertext is a tuple of degree+1 polynomials in basis Q, coefficient
domain.  Registered as JAX pytrees so whole scheme pipelines jit/vmap/shard
transparently.
"""

from __future__ import annotations

import dataclasses

import jax

from lattigo_tpu.ops import u64 as u

U64 = u.U64


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Ciphertext:
    value: list[U64]  # degree+1 polys, each ([L,N], [L,N]) uint32 pair
    is_ntt: bool = False

    @property
    def degree(self) -> int:
        return len(self.value) - 1

    def tree_flatten(self):
        return self.value, (self.is_ntt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), *aux)

    def copy(self) -> "Ciphertext":
        return Ciphertext(list(self.value), self.is_ntt)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Plaintext:
    value: U64  # one poly in basis Q (lifted by Delta)
    is_ntt: bool = False

    @property
    def degree(self) -> int:
        return 0

    def tree_flatten(self):
        return (self.value,), (self.is_ntt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def polys_of(op) -> list[U64]:
    """Uniform access to the polynomial vector of a Ciphertext/Plaintext."""
    if isinstance(op, Plaintext):
        return [op.value]
    return op.value
