"""Galois automorphisms X^i -> X^(gen*i) on R_Q, in and out of NTT domain.

TPU-native counterpart of ring/ring_galois.go.  All index/sign tables are
precomputed host-side per (static) Galois element; on device a permutation is
a single gather along the coefficient axis (plus a sign select in the
coefficient domain), which XLA lowers to one fused pass.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.number_theory import bit_reverse
from lattigo_tpu.tjit import table

U64 = u.U64


def gen_galois_params(n: int, gen: int) -> list[int]:
    """Galois elements gen^i mod 2N for column rotations
    (ring/ring_galois.go:9-26)."""
    m = n << 1
    out = [1]
    for _ in range(1, n >> 1):
        out.append(out[-1] * gen % m)
    return out


@functools.lru_cache(maxsize=None)
def permute_ntt_index(gal_el: int, n: int) -> np.ndarray:
    """Gather index table mapping the NTT-domain (bit-reversed) layout through
    the automorphism X -> X^gal_el (ring/ring_galois.go:29-52)."""
    log_n = n.bit_length() - 1
    mask = (n << 1) - 1
    idx = np.empty(n, dtype=np.int32)
    for i in range(n):
        t1 = 2 * bit_reverse(i, log_n) + 1
        t2 = ((gal_el * t1) & mask) >> 1  # (odd - 1) >> 1
        idx[i] = bit_reverse(t2, log_n)
    return idx


def permute_ntt(x: U64, gal_el: int) -> U64:
    """NTT-domain automorphism: one gather along the coefficient axis
    (ring/ring_galois.go:55-103)."""
    n = x[0].shape[-1]
    idx = table(
        f"galois/pntt/{n}/{gal_el}", lambda: permute_ntt_index(gal_el, n)
    )
    return jnp.take(x[0], idx, axis=-1), jnp.take(x[1], idx, axis=-1)


@functools.lru_cache(maxsize=None)
def _permute_tables(gal_el: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Coefficient-domain tables: out[k] = (-1)^flip[k] * in[src[k]]
    (inverse of ring/ring_galois.go:106-127's scatter)."""
    mask = n - 1
    log_n = n.bit_length() - 1
    src = np.empty(n, dtype=np.int32)
    flip = np.empty(n, dtype=np.uint32)
    for i in range(n):
        raw = i * gal_el
        src[raw & mask] = i
        flip[raw & mask] = (raw >> log_n) & 1
    return src, flip


def permute(ring, x: U64, gal_el: int) -> U64:
    """Coefficient-domain automorphism with sign flip on wrap-around."""
    n = ring.n
    src, flip = table(
        f"galois/perm/{n}/{gal_el}",
        lambda: tuple(np.ascontiguousarray(t) for t in _permute_tables(gal_el, n)),
    )
    flip = jnp.asarray(flip).astype(bool)
    lvl = ring.level_of(x)
    g = (jnp.take(x[0], src, axis=-1), jnp.take(x[1], src, axis=-1))
    q = ring._c(ring.q_, lvl)
    neg = u.sub64(q, g)
    # q - 0 == q: keep 0 coefficients as 0 after negation
    neg = u.select64(u.eq64(g, u.const64(0)), g, neg)
    return u.select64(flip, neg, g)
