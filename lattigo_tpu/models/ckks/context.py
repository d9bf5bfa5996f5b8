"""CKKS scheme context (ckks/ckks.go:17-89)."""

from __future__ import annotations

import functools

from lattigo_tpu.ops.basis_ext import Decomposer, FastBasisExtender
from lattigo_tpu.ops.galois import gen_galois_params
from lattigo_tpu.ops.ring import Ring

GALOIS_GEN = 5  # ckks/ckks.go:12


class CKKSContext:
    def __init__(self, params):
        params.gen_from_log_moduli()
        self.params = params
        n = params.n
        self.n = n
        self.max_slots = n >> 1
        self.scale = params.scale
        self.levels = len(params.qi)

        # partial products Q_0..Q_l (ckks/utils.go:113-122)
        self.bigint_chain = []
        acc = 1
        for q in params.qi:
            acc *= q
            self.bigint_chain.append(acc)

        self.ring_q = Ring(n, list(params.qi))
        self.ring_p = Ring(n, list(params.pi)) if params.pi else None
        self.ring_qp = Ring(n, list(params.qi) + list(params.pi))

        self.gal_el_rot_col_left = gen_galois_params(n, GALOIS_GEN)
        self.gal_el_rot_col_right = gen_galois_params(
            n, pow(GALOIS_GEN, 2 * n - 1, 2 * n)
        )
        self.gal_el_conjugate = 2 * n - 1

    @functools.cached_property
    def basis_q_p(self) -> FastBasisExtender:
        assert self.ring_p is not None, "modulus P is empty"
        return FastBasisExtender(self.ring_q, self.ring_p)

    @functools.cached_property
    def decomposer(self) -> Decomposer:
        return Decomposer(list(self.params.qi), list(self.params.pi))


_contexts: dict = {}


def get_context(params) -> CKKSContext:
    k = (params.log_n, params.log_slots, params.qi, params.pi)
    if k not in _contexts:
        _contexts[k] = CKKSContext(params)
    return _contexts[k]
