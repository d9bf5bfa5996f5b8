"""Polynomial samplers: uniform, discrete Gaussian, ternary (dense/sparse).

TPU-native counterparts of ring/sampler.go, ring/gaussianSampler.go and
ring/ternarySampler.go.  The reference consumes crypto/rand bytes through a
Knuth-Yao bit walk; here every sampler is a pure function of an explicit
``jax.random`` key (threefry), fully vectorized and jit-compatible, with the
*same distributions*:

* Gaussian: inverse-CDF over the identical 56-bit truncated PMF the
  reference's Knuth-Yao matrix encodes (gaussianSampler.go:111-149), with
  rejection on the truncated tail — distribution-equal to the KY walk.
* Ternary: P(0)=p, else sign-uniform (ternarySampler.go:117-200).
* Uniform: per-modulus masked rejection (sampler.go:11-66).

Bit-stream compatibility with Go's crypto/rand is NOT a goal (the reference's
own outputs are nondeterministic); party-synchronized determinism for MPC is
provided by the blake2b CRP generator in lattigo_tpu.utils.prng.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from lattigo_tpu.ops import u64 as u

U64 = u.U64


def _bits64(key, shape) -> U64:
    lo = jax.random.bits(jax.random.fold_in(key, 0), shape, dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32)
    return lo, hi


def uniform_poly(key, ring, lvl: int | None = None, batch=()) -> U64:
    """Uniform in [0, q_i) per limb via masked rejection (sampler.go:11-66)."""
    L = ring.L if lvl is None else lvl + 1
    shape = (*batch, L, ring.n)
    mask_lo = jnp.array(
        [[m & 0xFFFFFFFF] for m in ring.mask[:L]], dtype=jnp.uint32
    )
    mask_hi = jnp.array([[m >> 32] for m in ring.mask[:L]], dtype=jnp.uint32)
    q = (ring.q_[0][:L], ring.q_[1][:L])

    def draw(k):
        lo, hi = _bits64(k, shape)
        return lo & mask_lo, hi & mask_hi

    def cond(state):
        k, x, bad = state
        return jnp.any(bad)

    def body(state):
        k, x, bad = state
        k = jax.random.fold_in(k, 2)
        cand = draw(k)
        x = u.select64(bad, cand, x)
        bad = u.ge64(x, q)
        return k, x, bad

    x0 = draw(key)
    bad0 = u.ge64(x0, q)
    _, x, _ = jax.lax.while_loop(cond, body, (key, x0, bad0))
    return x


def _gaussian_cdf_table(sigma: float, bound: int) -> tuple[np.ndarray, int]:
    """Cumulative 56-bit integer weights of |x| = 0..bound-1, halving the
    zero row exactly as the reference's Knuth-Yao matrix does
    (gaussianSampler.go:111-149)."""
    prec = 56
    weights = []
    for i in range(bound):
        g = (1.0 / (sigma * 2.5066282746310007)) * math.exp(
            -(i * i) / (2.0 * sigma * sigma)
        )
        g *= 2.0 ** (prec - 1) if i == 0 else 2.0**prec
        x = int(g)
        if x == 0:
            break
        weights.append(x)
    cum = np.cumsum(weights, dtype=np.uint64)
    return cum, int(cum[-1])


def gaussian_poly(key, ring, sigma: float = 3.2, bound: int = 19, lvl: int | None = None, batch=()) -> U64:
    """Centered discrete Gaussian residues, one shared magnitude/sign draw
    mapped into every limb (gaussianSampler.go:211-240)."""
    L = ring.L if lvl is None else lvl + 1
    shape = (*batch, 1, ring.n)
    cum, total = _gaussian_cdf_table(sigma, bound)
    total_ = u.const64(total)

    def draw(k):
        # uniform 56-bit value as a U64 pair (no x64 mode required)
        lo = jax.random.bits(jax.random.fold_in(k, 0), shape, dtype=jnp.uint32)
        hi = jax.random.bits(jax.random.fold_in(k, 1), shape, dtype=jnp.uint32)
        return lo, hi & jnp.uint32((1 << 24) - 1)

    def cond(state):
        k, r = state
        return jnp.any(u.ge64(r, total_))

    def body(state):
        k, r = state
        k = jax.random.fold_in(k, 2)
        cand = draw(k)
        return k, u.select64(u.ge64(r, total_), cand, r)

    r0 = draw(key)
    _, r = jax.lax.while_loop(cond, body, (key, r0))
    # magnitude = number of cumulative weights <= r  (CDF inversion)
    mag = jnp.zeros(shape, dtype=jnp.uint32)
    for k in range(len(cum)):
        mag = mag + u.ge64(r, u.const64(int(cum[k]))).astype(jnp.uint32)
    sign = jax.random.bits(jax.random.fold_in(key, 3), shape, dtype=jnp.uint32) & 1

    full = (*batch, L, ring.n)
    pos = (jnp.broadcast_to(mag, full), jnp.zeros(full, jnp.uint32))
    q = (ring.q_[0][:L], ring.q_[1][:L])
    neg = u.sub64(q, pos)
    use_neg = (sign == 0) & (mag != 0)
    return u.select64(use_neg, neg, pos)


def ternary_poly(key, ring, p: float = 0.5, montgomery: bool = False, lvl: int | None = None, batch=()) -> U64:
    """Ternary residues with P(0)=p, P(+1)=P(-1)=(1-p)/2
    (ternarySampler.go:15-63)."""
    L = ring.L if lvl is None else lvl + 1
    shape = (*batch, 1, ring.n)
    thr = int(p * (1 << 30))
    r = jax.random.bits(jax.random.fold_in(key, 0), shape, dtype=jnp.uint32) >> 2
    sign = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32) & 1
    is_zero = r < jnp.uint32(thr)
    return _ternary_map(ring, L, batch, is_zero, sign, montgomery)


def ternary_sparse_poly(key, ring, hw: int, montgomery: bool = False, lvl: int | None = None) -> U64:
    """Exactly ``hw`` nonzero +-1 coefficients (ternarySampler.go:203-250)."""
    L = ring.L if lvl is None else lvl + 1
    n = ring.n
    base = jnp.concatenate(
        [jnp.ones(hw, jnp.uint32), jnp.zeros(n - hw, jnp.uint32)]
    )
    nonzero = jax.random.permutation(jax.random.fold_in(key, 0), base)
    sign = jax.random.bits(jax.random.fold_in(key, 1), (n,), dtype=jnp.uint32) & 1
    is_zero = (nonzero == 0).reshape(1, n)
    return _ternary_map(ring, L, (), is_zero, sign.reshape(1, n), montgomery)


def _ternary_map(ring, L, batch, is_zero, sign, montgomery):
    """Map {0, +1, -1} draws onto per-modulus residues
    (values from ring/ring_context.go:109-123's ternary tables)."""
    from lattigo_tpu.ops import number_theory as nt

    if montgomery:
        one = [nt.mform(1, q) for q in ring.moduli[:L]]
        minus = [nt.mform(q - 1, q) for q in ring.moduli[:L]]
    else:
        one = [1] * L
        minus = [q - 1 for q in ring.moduli[:L]]
    one_ = u.from_u64(np.array(one, dtype=np.uint64).reshape(L, 1))
    minus_ = u.from_u64(np.array(minus, dtype=np.uint64).reshape(L, 1))
    shape = (*batch, L, ring.n)
    val = u.select64(sign == 1, _bc(one_, shape), _bc(minus_, shape))
    zero = u.zeros64(shape)
    return u.select64(is_zero, zero, val)


def _bc(x: U64, shape) -> U64:
    return jnp.broadcast_to(x[0], shape), jnp.broadcast_to(x[1], shape)
