"""dBFV multi-party protocol tests (mirror of dbfv/dbfv_test.go): N parties
simulated in-process, shares aggregated by folding, results verified with the
centralized scheme against the summed secret key."""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import bfv, dbfv
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.utils.prng import CRPGenerator

PARAMS = bfv.Parameters(
    log_n=8,
    t=65537,
    log_qi=(46, 46),
    log_pi=(47,),
    log_qi_mul=(60, 60),
).gen_from_log_moduli()

N_PARTIES = 3
N = PARAMS.n
T = PARAMS.t
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def parties():
    ctx = bfv.get_context(PARAMS)
    kgens = [
        bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(100 + i))
        for i in range(N_PARTIES)
    ]
    sks = [kg.gen_secret_key() for kg in kgens]
    # collective secret key = sum of shares
    ring = ctx.ring_qp
    acc = sks[0].sk
    for s in sks[1:]:
        acc = ring.add(acc, s.sk)
    sk_col = bfv.SecretKey(acc)
    return ctx, sks, sk_col


@pytest.fixture(scope="module")
def crp_gen():
    ctx = bfv.get_context(PARAMS)
    g = CRPGenerator(b"test", ctx.ring_qp)
    g.seed(b"seed")
    return g


def fold(proto, shares):
    acc = shares[0]
    for s in shares[1:]:
        acc = proto.aggregate(acc, s)
    return acc


def rand_slots():
    return RNG.integers(0, T, size=N, dtype=np.uint64)


def enc_tools(sk_col):
    enc = bfv.Encoder(PARAMS)
    dec = bfv.Decryptor(PARAMS, sk_col)
    return enc, dec


def test_ckg(parties, crp_gen):
    ctx, sks, sk_col = parties
    crp = crp_gen.clock_poly()
    ckg = dbfv.CKGProtocol(PARAMS)
    shares = [ckg.gen_share(sk.sk, crp) for sk in sks]
    pk = ckg.gen_public_key(fold(ckg, shares), crp)

    # encrypt under collective pk, decrypt under summed sk
    enc, dec = enc_tools(sk_col)
    m = rand_slots()
    ct = bfv.Encryptor(PARAMS, pk=pk).encrypt(enc.encode_uint(m))
    np.testing.assert_array_equal(enc.decode_uint(dec.decrypt(ct)), m)


def test_cks(parties):
    ctx, sks, sk_col = parties
    kg2 = bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(777))
    sks_out = [kg2.gen_secret_key() for _ in range(N_PARTIES)]
    acc = sks_out[0].sk
    for s in sks_out[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    sk_out_col = bfv.SecretKey(acc)

    enc, dec = enc_tools(sk_col)
    m = rand_slots()
    ct = bfv.Encryptor(PARAMS, sk=sk_col).encrypt(enc.encode_uint(m))

    cks = dbfv.CKSProtocol(PARAMS, sigma_smudging=3.2)
    shares = [
        cks.gen_share(si.sk, so.sk, ct) for si, so in zip(sks, sks_out)
    ]
    ct2 = cks.key_switch(fold(cks, shares), ct)
    dec2 = bfv.Decryptor(PARAMS, sk_out_col)
    np.testing.assert_array_equal(enc.decode_uint(dec2.decrypt(ct2)), m)


def test_pcks(parties, crp_gen):
    ctx, sks, sk_col = parties
    kg2 = bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(888))
    sk_target, pk_target = kg2.gen_key_pair()

    enc, dec = enc_tools(sk_col)
    m = rand_slots()
    ct = bfv.Encryptor(PARAMS, sk=sk_col).encrypt(enc.encode_uint(m))

    pcks = dbfv.PCKSProtocol(PARAMS, sigma_smudging=3.2)
    shares = [pcks.gen_share(sk.sk, pk_target, ct) for sk in sks]
    ct2 = pcks.key_switch(fold(pcks, shares), ct)
    dec2 = bfv.Decryptor(PARAMS, sk_target)
    np.testing.assert_array_equal(enc.decode_uint(dec2.decrypt(ct2)), m)


def _stacked_crp(crp_gen, beta):
    import jax.numpy as jnp

    polys = [crp_gen.clock_poly() for _ in range(beta)]
    return (
        jnp.stack([p[0] for p in polys]),
        jnp.stack([p[1] for p in polys]),
    )


def test_rkg_three_rounds(parties, crp_gen):
    ctx, sks, sk_col = parties
    rkg = dbfv.RKGProtocol(PARAMS)
    crp = _stacked_crp(crp_gen, PARAMS.beta)

    ephs = [rkg.new_ephemeral_key() for _ in range(N_PARTIES)]
    r1 = fold(rkg, [rkg.gen_share_round_one(ephs[i], sks[i].sk, crp) for i in range(N_PARTIES)])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sks[i].sk, crp) for i in range(N_PARTIES)])
    r3 = fold(rkg, [rkg.gen_share_round_three(r2, ephs[i], sks[i].sk) for i in range(N_PARTIES)])
    rlk = rkg.gen_relinearization_key(r2, r3)

    enc, dec = enc_tools(sk_col)
    m0, m1 = rand_slots(), rand_slots()
    encryptor = bfv.Encryptor(PARAMS, sk=sk_col)
    ct0 = encryptor.encrypt(enc.encode_uint(m0))
    ct1 = encryptor.encrypt(enc.encode_uint(m1))
    ev = bfv.Evaluator(PARAMS)
    prod = ev.relinearize(ev.mul(ct0, ct1), rlk)
    np.testing.assert_array_equal(
        enc.decode_uint(dec.decrypt(prod)), m0 * m1 % T
    )


def test_rkg_naive(parties, crp_gen):
    ctx, sks, sk_col = parties
    # collective pk via CKG first
    crp = crp_gen.clock_poly()
    ckg = dbfv.CKGProtocol(PARAMS)
    pk = ckg.gen_public_key(
        fold(ckg, [ckg.gen_share(sk.sk, crp) for sk in sks]), crp
    )

    rkg = dbfv.RKGProtocolNaive(PARAMS)
    r1 = fold(rkg, [rkg.gen_share_round_one(sk.sk, pk) for sk in sks])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sk.sk, pk) for sk in sks])
    rlk = rkg.gen_relinearization_key(r2)

    enc, dec = enc_tools(sk_col)
    m0, m1 = rand_slots(), rand_slots()
    encryptor = bfv.Encryptor(PARAMS, pk=pk)
    ct0 = encryptor.encrypt(enc.encode_uint(m0))
    ct1 = encryptor.encrypt(enc.encode_uint(m1))
    ev = bfv.Evaluator(PARAMS)
    prod = ev.relinearize(ev.mul(ct0, ct1), rlk)
    np.testing.assert_array_equal(
        enc.decode_uint(dec.decrypt(prod)), m0 * m1 % T
    )


def test_rtg(parties, crp_gen):
    ctx, sks, sk_col = parties
    rtg = dbfv.RTGProtocol(PARAMS)
    crp = _stacked_crp(crp_gen, PARAMS.beta)
    rot_keys = bfv.RotationKeys()
    shares = [rtg.gen_share("left", 3, sk.sk, crp) for sk in sks]
    rtg.finalize("left", 3, fold(rtg, shares), crp, rot_keys)

    enc, dec = enc_tools(sk_col)
    m = rand_slots()
    ct = bfv.Encryptor(PARAMS, sk=sk_col).encrypt(enc.encode_uint(m))
    ev = bfv.Evaluator(PARAMS)
    got = enc.decode_uint(dec.decrypt(ev.rotate_columns(ct, 3, rot_keys)))
    row = N // 2
    want = np.concatenate([np.roll(m[:row], -3), np.roll(m[row:], -3)])
    np.testing.assert_array_equal(got, want)


def test_refresh(parties, crp_gen):
    ctx, sks, sk_col = parties
    enc, dec = enc_tools(sk_col)
    m = rand_slots()
    ct = bfv.Encryptor(PARAMS, sk=sk_col).encrypt(enc.encode_uint(m))

    rfp = dbfv.RefreshProtocol(PARAMS)
    crs = crp_gen.clock_poly()
    shares = [rfp.gen_share(sk.sk, ct, crs) for sk in sks]
    ct2 = rfp.finalize(ct, crs, fold(rfp, shares))
    np.testing.assert_array_equal(enc.decode_uint(dec.decrypt(ct2)), m)
