"""Property tests of the vector modular-reduction kernels against exact
Python-int references (the analog of ring/ring_test.go:352-421 BRed/MRed
vs big.Int)."""

import random

import numpy as np

from lattigo_tpu.ops import modred as mr
from lattigo_tpu.ops import number_theory as nt
from lattigo_tpu.ops import u64 as u

Q60 = 1152921504606994433  # first NTT prime above 2^60 for N=2^13
Q30 = nt.generate_ntt_primes(30, 12, 1)[0]

rng = random.Random(1234)
N = 2048
XS = np.array([rng.getrandbits(64) for _ in range(N)], dtype=np.uint64)
YS = np.array([rng.getrandbits(64) for _ in range(N)], dtype=np.uint64)


def _consts(q):
    b = nt.bred_params(q)
    return (
        u.const64(q),
        u.const64(b[0]),
        u.const64(b[1]),
        u.const64(nt.mred_params(q)),
    )


def test_mul64_128_exact():
    lo, hi = u.mul64_128(u.from_u64(XS), u.from_u64(YS))
    ref = [int(a) * int(b) for a, b in zip(XS.tolist(), YS.tolist())]
    mask = (1 << 64) - 1
    np.testing.assert_array_equal(
        u.to_u64(lo), np.array([r & mask for r in ref], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        u.to_u64(hi), np.array([r >> 64 for r in ref], dtype=np.uint64)
    )


def test_add_sub_shift():
    X, Y = u.from_u64(XS), u.from_u64(YS)
    mask = (1 << 64) - 1
    np.testing.assert_array_equal(
        u.to_u64(u.add64(X, Y)),
        np.array([(int(a) + int(b)) & mask for a, b in zip(XS, YS)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        u.to_u64(u.sub64(X, Y)),
        np.array([(int(a) - int(b)) & mask for a, b in zip(XS, YS)], dtype=np.uint64),
    )
    for sh in (0, 1, 13, 32, 47, 63):
        np.testing.assert_array_equal(
            u.to_u64(u.shl64(X, sh)),
            np.array([(int(a) << sh) & mask for a in XS], dtype=np.uint64),
        )
        np.testing.assert_array_equal(
            u.to_u64(u.shr64(X, sh)),
            np.array([int(a) >> sh for a in XS], dtype=np.uint64),
        )


def _check_modq(q):
    Q, U0, U1, QINV = _consts(q)
    X, Y = u.from_u64(XS), u.from_u64(YS)
    xq = XS % np.uint64(q)
    yq = YS % np.uint64(q)
    Xq, Yq = u.from_u64(xq), u.from_u64(yq)

    want_mform = np.array([(int(a) << 64) % q for a in xq], dtype=np.uint64)
    np.testing.assert_array_equal(u.to_u64(mr.mform(Xq, Q, U0, U1)), want_mform)

    xm = mr.mform(Xq, Q, U0, U1)
    want = np.array([int(a) * int(b) % q for a, b in zip(xq, yq)], dtype=np.uint64)
    np.testing.assert_array_equal(u.to_u64(mr.mred(xm, Yq, Q, QINV)), want)

    lazy = u.to_u64(mr.mred_constant(xm, Yq, Q, QINV))
    assert (lazy < 2 * q).all()
    assert ((lazy % np.uint64(q)) == want).all()

    want = np.array([int(a) * int(b) % q for a, b in zip(XS, YS)], dtype=np.uint64)
    np.testing.assert_array_equal(u.to_u64(mr.bred(X, Y, Q, U0, U1)), want)

    np.testing.assert_array_equal(
        u.to_u64(mr.bred_add(X, Q, U0)), XS % np.uint64(q)
    )
    np.testing.assert_array_equal(u.to_u64(mr.inv_mform(xm, Q, QINV)), xq)


def test_modred_60bit():
    _check_modq(Q60)


def test_modred_30bit():
    _check_modq(Q30)


def test_primitive_root_matches_reference_choice():
    # The reference's published default moduli all use the deterministic
    # smallest-g search; spot check group order property.
    for q in (Q60, Q30):
        g = nt.primitive_root(q)
        assert pow(g, q - 1, q) == 1
        for f in set(nt.get_factors(q - 1)):
            assert pow(g, (q - 1) // f, q) != 1
