"""CKKS scheme tests (mirror of ckks/ckks_test.go): statistical precision
assertions — decode, compare slot-wise, require median log2(1/err) above a
budget (the reference asserts >= ~13 bits on its default params)."""

import numpy as np
import pytest

from lattigo_tpu.models import ckks

PARAMS = ckks.Parameters(
    log_n=8,
    log_slots=7,
    scale=float(1 << 32),
    log_qi=(45, 32, 32, 32),
    log_pi=(45,),
).gen_from_log_moduli()

SLOTS = PARAMS.slots
RNG = np.random.default_rng(1)
MIN_PREC = 12.0


def rand_values():
    return (RNG.uniform(-1, 1, SLOTS) + 1j * RNG.uniform(-1, 1, SLOTS)).astype(
        np.complex128
    )


def assert_precision(got, want, min_prec=MIN_PREC):
    err = np.abs(np.asarray(got) - np.asarray(want))
    err = np.maximum(err, 1e-16)
    med = np.median(np.log2(1 / err))
    assert med >= min_prec, f"median precision {med:.2f} < {min_prec}"
    return med


@pytest.fixture(scope="module")
def keys():
    kgen = ckks.KeyGenerator(PARAMS)
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    return kgen, sk, pk, rlk


@pytest.fixture(scope="module")
def tools(keys):
    kgen, sk, pk, rlk = keys
    return {
        "enc": ckks.Encoder(PARAMS),
        "enc_pk": ckks.Encryptor(PARAMS, pk=pk),
        "enc_sk": ckks.Encryptor(PARAMS, sk=sk),
        "dec": ckks.Decryptor(PARAMS, sk),
        "eval": ckks.Evaluator(PARAMS),
        "rlk": rlk,
    }


def roundtrip(tools, ct):
    return tools["enc"].decode(tools["dec"].decrypt(ct))


def encrypt(tools, values):
    return tools["enc_pk"].encrypt(tools["enc"].encode(values))


def test_encode_decode(tools):
    v = rand_values()
    pt = tools["enc"].encode(v)
    assert_precision(tools["enc"].decode(pt), v, 20)


@pytest.mark.parametrize("path", ["pk", "sk", "pk_fast", "sk_fast"])
def test_encrypt_decrypt(tools, path):
    v = rand_values()
    enc = tools["enc_pk" if path.startswith("pk") else "enc_sk"]
    ct = enc.encrypt(tools["enc"].encode(v), fast=path.endswith("fast"))
    assert_precision(roundtrip(tools, ct), v)


def test_add_sub_neg(tools):
    v0, v1 = rand_values(), rand_values()
    ct0, ct1 = encrypt(tools, v0), encrypt(tools, v1)
    ev = tools["eval"]
    assert_precision(roundtrip(tools, ev.add(ct0, ct1)), v0 + v1)
    assert_precision(roundtrip(tools, ev.sub(ct0, ct1)), v0 - v1)
    assert_precision(roundtrip(tools, ev.neg(ct0)), -v0)
    # ciphertext + plaintext
    pt1 = tools["enc"].encode(v1)
    assert_precision(roundtrip(tools, ev.add(ct0, pt1)), v0 + v1)


def test_const_ops(tools):
    v = rand_values()
    ct = encrypt(tools, v)
    ev = tools["eval"]
    assert_precision(roundtrip(tools, ev.add_const(ct, 3.5 + 0.25j)), v + 3.5 + 0.25j)
    got = ev.mult_by_const(ct, 0.5 - 0.75j)
    assert_precision(roundtrip(tools, got), v * (0.5 - 0.75j))
    assert_precision(roundtrip(tools, ev.mult_by_i(ct)), v * 1j)
    assert_precision(roundtrip(tools, ev.div_by_i(ct)), v * -1j)
    assert_precision(roundtrip(tools, ev.mult_by_const(ct, 3)), v * 3)


def test_mul_relin_rescale(tools):
    v0, v1 = rand_values(), rand_values()
    ct0, ct1 = encrypt(tools, v0), encrypt(tools, v1)
    ev = tools["eval"]
    prod = ev.mul_relin(ct0, ct1, tools["rlk"])
    assert prod.degree == 1
    assert_precision(roundtrip(tools, prod), v0 * v1)
    rs = ev.rescale(prod)
    assert rs.level == ct0.level - 1
    assert_precision(roundtrip(tools, rs), v0 * v1)
    # no relin: degree 2 decrypts fine too
    deg2 = ev.mul_relin(ct0, ct1, None)
    assert deg2.degree == 2
    assert_precision(roundtrip(tools, deg2), v0 * v1)
    # ct x pt
    pt1 = tools["enc"].encode(v1)
    assert_precision(roundtrip(tools, ev.mul_relin(ct0, pt1, None)), v0 * v1)


def test_mul_chain_depth3(tools):
    v = rand_values() * 0.7
    ct = encrypt(tools, v)
    ev = tools["eval"]
    acc, want = ct, v
    for _ in range(3):
        acc = ev.rescale(ev.mul_relin(acc, ct, tools["rlk"]))
        want = want * v
    assert_precision(roundtrip(tools, acc), want, 10)


def test_rotations(keys, tools):
    kgen, sk, pk, rlk = keys
    rk = kgen.gen_rotation_keys_pow2(sk)
    v = rand_values()
    ct = encrypt(tools, v)
    ev = tools["eval"]
    for k in (1, 3, SLOTS - 2):
        got = roundtrip(tools, ev.rotate_columns(ct, k, rk))
        assert_precision(got, np.roll(v, -k), 11)
    got = roundtrip(tools, ev.conjugate(ct, rk))
    assert_precision(got, np.conj(v))


def test_rotate_hoisted(keys, tools):
    kgen, sk, pk, rlk = keys
    rk = ckks.RotationKeys()
    for k in (2, 5):
        kgen.gen_rot("left", sk, k, rk)
    v = rand_values()
    ct = encrypt(tools, v)
    outs = tools["eval"].rotate_hoisted(ct, [2, 5], rk)
    for k in (2, 5):
        assert_precision(roundtrip(tools, outs[k]), np.roll(v, -k), 11)


def test_switch_keys(keys, tools):
    kgen, sk, pk, rlk = keys
    sk2 = kgen.gen_secret_key()
    swk = kgen.gen_switching_key(sk, sk2)
    v = rand_values()
    ct = encrypt(tools, v)
    ct2 = tools["eval"].switch_keys(ct, swk)
    dec2 = ckks.Decryptor(PARAMS, sk2)
    assert_precision(tools["enc"].decode(dec2.decrypt(ct2)), v)


def test_power_and_inverse(tools):
    ev = tools["eval"]
    v = rand_values() * 0.5
    ct = encrypt(tools, v)
    got = roundtrip(tools, ckks.algorithms.power(ev, ct, 2, tools["rlk"]))
    assert_precision(got, v**2, 10)

    vr = RNG.uniform(0.7, 1.3, SLOTS).astype(np.complex128)
    ctr = encrypt(tools, vr)
    inv = ckks.algorithms.inverse(ev, ctr, 2, tools["rlk"])
    assert_precision(roundtrip(tools, inv), 1 / vr, 6)


def test_evaluate_poly(tools):
    ev = tools["eval"]
    v = rand_values().real.astype(np.complex128) * 0.9
    ct = encrypt(tools, v)
    # sin-like cubic: x - x^3/6
    coeffs = [0, 1.0, 0, -1.0 / 6]
    got = roundtrip(tools, ckks.evaluate_poly_eco(ev, ct, coeffs, tools["rlk"]))
    want = v - v**3 / 6
    assert_precision(got, want, 10)


def test_chebyshev_interpolation(tools):
    import math

    ev = tools["eval"]
    cheby = ckks.approximate(lambda x: complex(math.exp(x.real), 0), -1, 1, 7)
    v = RNG.uniform(-0.95, 0.95, SLOTS).astype(np.complex128)
    ct = encrypt(tools, v)
    got = roundtrip(tools, ckks.evaluate_cheby_eco(ev, ct, cheby, tools["rlk"]))
    want = np.exp(v.real)
    assert_precision(got, want, 7)


def test_sparse_keys_and_crp(keys, tools):
    kgen, sk, pk, rlk = keys
    sk_sp, pk_sp = kgen.gen_key_pair_sparse(hw=64)
    enc = ckks.Encryptor(PARAMS, pk=pk_sp)
    dec = ckks.Decryptor(PARAMS, sk_sp)
    v = rand_values()
    ct = enc.encrypt(tools["enc"].encode(v))
    assert_precision(tools["enc"].decode(dec.decrypt(ct)), v)

    from lattigo_tpu.utils.prng import CRPGenerator

    crp = CRPGenerator(b"x", ckks.get_context(PARAMS).ring_qp).clock_poly()
    enc_crp = ckks.Encryptor(PARAMS, sk=sk)
    ct = enc_crp.encrypt_from_crp(tools["enc"].encode(v), crp)
    assert_precision(roundtrip(tools, ct), v)


def test_drop_level_and_level_mismatch_ops(tools):
    ev = tools["eval"]
    v0, v1 = rand_values(), rand_values()
    ct0, ct1 = encrypt(tools, v0), encrypt(tools, v1)
    low = ev.drop_level(ct0, 1)
    assert low.level == ct0.level - 1
    got = roundtrip(tools, ev.add(low, ct1))
    assert_precision(got, v0 + v1)
