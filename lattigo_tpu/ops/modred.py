"""Vectorized Montgomery / Barrett / conditional modular reduction.

TPU-native re-implementations of the reference's scalar kernels
(ring/modular_reduction.go) over the two-plane uint32 representation from
:mod:`lattigo_tpu.ops.u64`.  Each function is elementwise over arbitrarily
shaped arrays; per-modulus constants are passed as broadcastable U64 pairs
(typically shape [L, 1] against [L, N] coefficient planes).

Naming and semantics follow the reference:

* ``mform(a)``        = a * 2^64 mod q           (ring/modular_reduction.go:15)
* ``mred(x, y)``      = x * y * 2^-64 mod q      (:70)
* ``bred_add(x)``     = x mod q for x < 2^64     (:112)
* ``bred(x, y)``      = x * y mod q              (:133)
* ``cred(a)``         = a mod q for a < 2q       (:211)

``*_constant`` variants return values in [0, 2q) (branchless lazy form).
All arithmetic wraps mod 2^64 exactly like Go's uint64.
"""

from __future__ import annotations

from lattigo_tpu.ops.u64 import (
    U64,
    add64,
    ge64,
    mul64_128,
    mulhi64,
    mullo64,
    neg64,
    select64,
    sub64,
)


def cred(a: U64, q: U64) -> U64:
    """a mod q for a in [0, 2q)."""
    return select64(ge64(a, q), sub64(a, q), a)


def mform_constant(a: U64, q: U64, u0: U64, u1: U64) -> U64:
    """a * 2^64 mod q in [0, 2q); (u0, u1) = floor(2^128/q) hi/lo words."""
    mhi = mulhi64(a, u1)
    t = add64(mullo64(a, u0), mhi)
    return mullo64(neg64(t), q)


def mform(a: U64, q: U64, u0: U64, u1: U64) -> U64:
    """a * 2^64 mod q, fully reduced."""
    return cred(mform_constant(a, q, u0, u1), q)


def inv_mform_constant(a: U64, q: U64, qinv: U64) -> U64:
    """a * 2^-64 mod q in [0, 2q) for a in Montgomery form."""
    h = mulhi64(mullo64(a, qinv), q)
    return sub64(q, h)


def inv_mform(a: U64, q: U64, qinv: U64) -> U64:
    return cred(inv_mform_constant(a, q, qinv), q)


def mred_constant(x: U64, y: U64, q: U64, qinv: U64) -> U64:
    """x * y * 2^-64 mod q in [0, 2q); qinv = q^-1 mod 2^64."""
    alo, ahi = mul64_128(x, y)
    r = mullo64(alo, qinv)
    h = mulhi64(r, q)
    return add64(sub64(ahi, h), q)


def mred(x: U64, y: U64, q: U64, qinv: U64) -> U64:
    """x * y * 2^-64 mod q, fully reduced."""
    return cred(mred_constant(x, y, q, qinv), q)


def bred_add_constant(x: U64, q: U64, u0: U64) -> U64:
    """x mod q in [0, 2q) for any 64-bit x; u0 = floor(2^128/q) >> 64."""
    s0 = mulhi64(x, u0)
    return sub64(x, mullo64(s0, q))


def bred_add(x: U64, q: U64, u0: U64) -> U64:
    """x mod q, fully reduced, for any 64-bit x."""
    return cred(bred_add_constant(x, q, u0), q)


def bred_constant(x: U64, y: U64, q: U64, u0: U64, u1: U64) -> U64:
    """x * y mod q in [0, 2q) for arbitrary 64-bit x, y."""
    alo, ahi = mul64_128(x, y)
    lhi = mulhi64(alo, u1)
    mlo, mhi = mul64_128(alo, u0)
    s0, carry = _add64_with_carry(mlo, lhi)
    s1 = add64(mhi, carry)
    mlo2, mhi2 = mul64_128(ahi, u1)
    _, carry2 = _add64_with_carry(mlo2, s0)
    lhi2 = add64(mhi2, carry2)
    s0f = add64(add64(mullo64(ahi, u0), s1), lhi2)
    return sub64(alo, mullo64(s0f, q))


def bred(x: U64, y: U64, q: U64, u0: U64, u1: U64) -> U64:
    """x * y mod q, fully reduced, for arbitrary 64-bit x, y."""
    return cred(bred_constant(x, y, q, u0, u1), q)


def mul_shoup(v: U64, w: U64, w_shoup: U64, q: U64) -> U64:
    """v * w mod q in [0, 2q), via Shoup's trick for a precomputed w:
    w_shoup = floor(w * 2^64 / q).  Valid for any v < 2^64, w < q.

    Cheaper than mred_constant (one mulhi + two mullo instead of a full
    128-bit product): the butterfly workhorse of the Pallas NTT kernels.
    """
    hi = mulhi64(v, w_shoup)
    return sub64(mullo64(v, w), mullo64(hi, q))


def _add64_with_carry(x: U64, y: U64) -> tuple[U64, U64]:
    from lattigo_tpu.ops.u64 import add64_carry

    s, c = add64_carry(x, y)
    return s, (c, c * 0)
