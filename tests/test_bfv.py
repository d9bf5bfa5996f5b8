"""BFV scheme tests (mirror of bfv/bfv_test.go): exact equality between
decrypted-decoded results and plaintext-side computation in Z_t."""

import numpy as np
import pytest

from lattigo_tpu.models import bfv

# Small test parameters (N=256) so the eager-CPU suite stays fast; the
# default PN12..PN15 sets are exercised in bench.py on TPU.
PARAMS = bfv.Parameters(
    log_n=8,
    t=65537,
    log_qi=(46, 46),
    log_pi=(47,),
    log_qi_mul=(60, 60),
).gen_from_log_moduli()

N = PARAMS.n
T = PARAMS.t
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def keys():
    kgen = bfv.KeyGenerator(PARAMS)
    sk, pk = kgen.gen_key_pair()
    return kgen, sk, pk


@pytest.fixture(scope="module")
def tools(keys):
    kgen, sk, pk = keys
    return {
        "enc": bfv.Encoder(PARAMS),
        "enc_pk": bfv.Encryptor(PARAMS, pk=pk),
        "enc_sk": bfv.Encryptor(PARAMS, sk=sk),
        "dec": bfv.Decryptor(PARAMS, sk),
        "eval": bfv.Evaluator(PARAMS),
    }


def rand_slots():
    return RNG.integers(0, T, size=N, dtype=np.uint64)


def roundtrip(tools, ct):
    return tools["enc"].decode_uint(tools["dec"].decrypt(ct))


def test_encode_decode(tools):
    m = rand_slots()
    pt = tools["enc"].encode_uint(m)
    np.testing.assert_array_equal(tools["enc"].decode_uint(pt), m)
    ms = RNG.integers(-(T // 2), T // 2, size=N, dtype=np.int64)
    pts = tools["enc"].encode_int(ms)
    np.testing.assert_array_equal(tools["enc"].decode_int(pts), ms)


@pytest.mark.parametrize("path", ["pk", "sk", "pk_fast", "sk_fast"])
def test_encrypt_decrypt(tools, path):
    m = rand_slots()
    pt = tools["enc"].encode_uint(m)
    enc = tools["enc_pk" if path.startswith("pk") else "enc_sk"]
    ct = enc.encrypt(pt, fast=path.endswith("fast"))
    np.testing.assert_array_equal(roundtrip(tools, ct), m)


def test_add_sub_neg(tools):
    m0, m1 = rand_slots(), rand_slots()
    ct0 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m0))
    ct1 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m1))
    ev = tools["eval"]
    np.testing.assert_array_equal(roundtrip(tools, ev.add(ct0, ct1)), (m0 + m1) % T)
    # NB: compute expectations in int64 — uint64 wraparound mod 2^64 is NOT
    # mod-t arithmetic (2^64 mod 65537 == 1).
    want_sub = ((m0.astype(np.int64) - m1.astype(np.int64)) % T).astype(np.uint64)
    np.testing.assert_array_equal(roundtrip(tools, ev.sub(ct0, ct1)), want_sub)
    want_neg = ((-m0.astype(np.int64)) % T).astype(np.uint64)
    np.testing.assert_array_equal(roundtrip(tools, ev.neg(ct0)), want_neg)
    # ct + pt
    pt1 = tools["enc"].encode_uint(m1)
    np.testing.assert_array_equal(roundtrip(tools, ev.add(ct0, pt1)), (m0 + m1) % T)


def test_mul_scalar(tools):
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    got = roundtrip(tools, tools["eval"].mul_scalar(ct, 9))
    np.testing.assert_array_equal(got, m * 9 % T)


def test_mul_ct_ct_degree2(tools):
    m0, m1 = rand_slots(), rand_slots()
    ct0 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m0))
    ct1 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m1))
    prod = tools["eval"].mul(ct0, ct1)
    assert prod.degree == 2
    np.testing.assert_array_equal(roundtrip(tools, prod), m0 * m1 % T)


def test_mul_relinearize(keys, tools):
    kgen, sk, pk = keys
    rlk = kgen.gen_relin_key(sk, 1)
    m0, m1 = rand_slots(), rand_slots()
    ct0 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m0))
    ct1 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m1))
    prod = tools["eval"].relinearize(tools["eval"].mul(ct0, ct1), rlk)
    assert prod.degree == 1
    np.testing.assert_array_equal(roundtrip(tools, prod), m0 * m1 % T)


def test_square(keys, tools):
    kgen, sk, pk = keys
    rlk = kgen.gen_relin_key(sk, 1)
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    sq = tools["eval"].relinearize(tools["eval"].mul(ct, ct), rlk)
    np.testing.assert_array_equal(roundtrip(tools, sq), m * m % T)


def test_mul_ct_pt(tools):
    m0, m1 = rand_slots(), rand_slots()
    ct0 = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m0))
    pt1 = tools["enc"].encode_uint(m1)
    got = roundtrip(tools, tools["eval"].mul(ct0, pt1))
    np.testing.assert_array_equal(got, m0 * m1 % T)


def test_switch_keys(keys, tools):
    kgen, sk, pk = keys
    sk2 = kgen.gen_secret_key()
    swk = kgen.gen_switching_key(sk, sk2)
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    ct2 = tools["eval"].switch_keys(ct, swk)
    dec2 = bfv.Decryptor(PARAMS, sk2)
    got = tools["enc"].decode_uint(dec2.decrypt(ct2))
    np.testing.assert_array_equal(got, m)


def rotate_slots(m, k):
    """Left-rotate each of the two rows by k (bfv semantics)."""
    row = N // 2
    top, bot = m[:row], m[row:]
    return np.concatenate([np.roll(top, -k), np.roll(bot, -k)])


def test_rotate_columns_specific(keys, tools):
    kgen, sk, pk = keys
    rk = bfv.RotationKeys()
    kgen.gen_rot("left", sk, 3, rk)
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    got = roundtrip(tools, tools["eval"].rotate_columns(ct, 3, rk))
    np.testing.assert_array_equal(got, rotate_slots(m, 3))


def test_rotate_pow2_and_rows(keys, tools):
    kgen, sk, pk = keys
    rk = kgen.gen_rotation_keys_pow2(sk)
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    for k in (1, 5, N // 2 - 1):
        got = roundtrip(tools, tools["eval"].rotate_columns(ct, k, rk))
        np.testing.assert_array_equal(got, rotate_slots(m, k), err_msg=f"k={k}")
    got = roundtrip(tools, tools["eval"].rotate_rows(ct, rk))
    np.testing.assert_array_equal(got, np.concatenate([m[N // 2 :], m[: N // 2]]))


def test_inner_sum(keys, tools):
    kgen, sk, pk = keys
    rk = kgen.gen_rotation_keys_pow2(sk)
    m = rand_slots()
    ct = tools["enc_pk"].encrypt(tools["enc"].encode_uint(m))
    got = roundtrip(tools, tools["eval"].inner_sum(ct, rk))
    np.testing.assert_array_equal(got, np.full(N, m.sum() % T, dtype=np.uint64))


def test_encrypt_from_crp(keys, tools):
    from lattigo_tpu.utils.prng import CRPGenerator

    kgen, sk, pk = keys
    crp_gen = CRPGenerator(b"k", bfv.get_context(PARAMS).ring_qp)
    crp = crp_gen.clock_poly()  # uniform; read as the NTT-domain CRS "a"
    m = rand_slots()
    ct = tools["enc_sk"].encrypt_from_crp(tools["enc"].encode_uint(m), crp)
    np.testing.assert_array_equal(roundtrip(tools, ct), m)
