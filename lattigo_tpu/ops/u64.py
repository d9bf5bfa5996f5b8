"""Vectorized 64-bit unsigned arithmetic on 32-bit lanes.

TPUs have no 64-bit integer multiplier, so every uint64 quantity is carried as
a pair ``(lo, hi)`` of ``uint32`` arrays of identical shape ("two-plane"
representation).  All helpers are shape-polymorphic and broadcast like jnp
ops, so the same primitives serve scalars-as-[L,1] constants and full [L, N]
coefficient planes.

The 32x32->64 building block splits operands into 16-bit halves (four hardware
multiplies + the native low-32 multiply); 64-bit school-book products ride on
top of it.  These are the TPU equivalents of Go's ``math/bits.Mul64/Add64``
intrinsics that the reference's kernels are built from
(ring/modular_reduction.go).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# A uint64 value is a (lo, hi) pair of uint32 arrays.
U64 = tuple[jnp.ndarray, jnp.ndarray]

_M16 = np.uint32(0xFFFF)
_U32 = jnp.uint32


def from_u64(a) -> U64:
    """numpy uint64 array -> (lo, hi) uint32 pair.

    Returns HOST numpy arrays on purpose: jnp ops consume them transparently,
    jit embeds them as constants, and — critically — objects that cache these
    pairs (ring contexts, basis-extension tables, twiddle caches) never hold
    device tracers, so they can be built inside or outside a jit trace alike.
    """
    a = np.asarray(a, dtype=np.uint64)
    return (
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (a >> np.uint64(32)).astype(np.uint32),
    )


def to_u64(x: U64) -> np.ndarray:
    """(lo, hi) pair -> numpy uint64 array (host readback)."""
    lo = np.asarray(x[0]).astype(np.uint64)
    hi = np.asarray(x[1]).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def const64(v: int, shape=()) -> U64:
    lo = jnp.full(shape, v & 0xFFFFFFFF, dtype=_U32)
    hi = jnp.full(shape, (v >> 32) & 0xFFFFFFFF, dtype=_U32)
    return lo, hi


def zeros64(shape) -> U64:
    z = jnp.zeros(shape, dtype=_U32)
    return z, z


def _b2u(b) -> jnp.ndarray:
    return b.astype(_U32)


# ---------------------------------------------------------------------------
# add / sub / compare / select / shift
# ---------------------------------------------------------------------------


def add64(x: U64, y: U64) -> U64:
    lo = x[0] + y[0]
    carry = _b2u(lo < y[0])
    hi = x[1] + y[1] + carry
    return lo, hi


def add64_carry(x: U64, y: U64) -> tuple[U64, jnp.ndarray]:
    """(x + y) mod 2^64 and the carry-out bit (uint32 0/1)."""
    lo = x[0] + y[0]
    c0 = _b2u(lo < y[0])
    h = x[1] + y[1]
    c1 = _b2u(h < y[1])
    hi = h + c0
    c2 = _b2u(hi < c0)
    return (lo, hi), c1 + c2


def sub64(x: U64, y: U64) -> U64:
    lo = x[0] - y[0]
    borrow = _b2u(x[0] < y[0])
    hi = x[1] - y[1] - borrow
    return lo, hi


def neg64(x: U64) -> U64:
    return sub64(const64(0), x)


def lt64(x: U64, y: U64) -> jnp.ndarray:
    return (x[1] < y[1]) | ((x[1] == y[1]) & (x[0] < y[0]))


def ge64(x: U64, y: U64) -> jnp.ndarray:
    return ~lt64(x, y)


def eq64(x: U64, y: U64) -> jnp.ndarray:
    return (x[0] == y[0]) & (x[1] == y[1])


def select64(pred, a: U64, b: U64) -> U64:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def shl64(x: U64, n: int) -> U64:
    """x << n for a static 0 <= n < 64."""
    if n == 0:
        return x
    if n >= 32:
        return jnp.zeros_like(x[0]), x[0] << (n - 32)
    return x[0] << n, (x[1] << n) | (x[0] >> (32 - n))


def shr64(x: U64, n: int) -> U64:
    """x >> n for a static 0 <= n < 64."""
    if n == 0:
        return x
    if n >= 32:
        return x[1] >> (n - 32), jnp.zeros_like(x[1])
    return (x[0] >> n) | (x[1] << (32 - n)), x[1] >> n


def and64(x: U64, y: U64) -> U64:
    return x[0] & y[0], x[1] & y[1]


def or64(x: U64, y: U64) -> U64:
    return x[0] | y[0], x[1] | y[1]


def xor64(x: U64, y: U64) -> U64:
    return x[0] ^ y[0], x[1] ^ y[1]


# ---------------------------------------------------------------------------
# multiplication
# ---------------------------------------------------------------------------


def mul32(a, b) -> U64:
    """Full 32x32 -> 64 product of uint32 arrays, as a (lo, hi) pair."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    lo = a * b  # exact mod 2^32 in hardware
    m10 = a1 * b0
    m01 = a0 * b1
    t = ((a0 * b0) >> 16) + (m10 & _M16) + (m01 & _M16)
    hi = a1 * b1 + (m10 >> 16) + (m01 >> 16) + (t >> 16)
    return lo, hi


def mul32_hi(a, b) -> jnp.ndarray:
    """High 32 bits of a*b for uint32 arrays."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    m10 = a1 * b0
    m01 = a0 * b1
    t = ((a0 * b0) >> 16) + (m10 & _M16) + (m01 & _M16)
    return a1 * b1 + (m10 >> 16) + (m01 >> 16) + (t >> 16)


def mullo64(x: U64, y: U64) -> U64:
    """(x * y) mod 2^64."""
    lo, h = mul32(x[0], y[0])
    return lo, h + x[0] * y[1] + x[1] * y[0]


def mul64_128(x: U64, y: U64) -> tuple[U64, U64]:
    """Full 64x64 -> 128 product, returned as (lo64, hi64) pairs —
    the vector analog of Go's bits.Mul64."""
    p00l, p00h = mul32(x[0], y[0])
    p01l, p01h = mul32(x[0], y[1])
    p10l, p10h = mul32(x[1], y[0])
    p11l, p11h = mul32(x[1], y[1])

    # limb 1
    s = p00h + p01l
    c = _b2u(s < p01l)
    r1 = s + p10l
    c += _b2u(r1 < p10l)

    # limb 2
    s2 = p01h + p10h
    c2 = _b2u(s2 < p10h)
    s2 = s2 + p11l
    c2 += _b2u(s2 < p11l)
    r2 = s2 + c
    c2 += _b2u(r2 < c)

    r3 = p11h + c2
    return (p00l, r1), (r2, r3)


def mulhi64(x: U64, y: U64) -> U64:
    """High 64 bits of x*y (exact, carries from the low half included)."""
    return mul64_128(x, y)[1]
