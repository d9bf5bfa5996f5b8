"""dCKKS multi-party protocol tests (mirror of dckks/dckks_test.go):
precision-budget verification against the summed secret key; refresh must
restore the level."""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import ckks, dckks
from lattigo_tpu.utils.prng import CRPGenerator

PARAMS = ckks.Parameters(
    log_n=8,
    log_slots=7,
    scale=float(1 << 32),
    log_qi=(45, 32, 32, 32),
    log_pi=(45,),
).gen_from_log_moduli()

N_PARTIES = 3
SLOTS = PARAMS.slots
RNG = np.random.default_rng(4)
MIN_PREC = 11.0


def rand_values():
    return (RNG.uniform(-1, 1, SLOTS) + 1j * RNG.uniform(-1, 1, SLOTS)).astype(
        np.complex128
    )


def assert_precision(got, want, min_prec=MIN_PREC):
    err = np.maximum(np.abs(np.asarray(got) - np.asarray(want)), 1e-16)
    med = np.median(np.log2(1 / err))
    assert med >= min_prec, f"median precision {med:.2f} < {min_prec}"


@pytest.fixture(scope="module")
def parties():
    ctx = ckks.get_context(PARAMS)
    kgens = [
        ckks.KeyGenerator(PARAMS, rng_key=jax.random.key(300 + i))
        for i in range(N_PARTIES)
    ]
    sks = [kg.gen_secret_key() for kg in kgens]
    acc = sks[0].sk
    for s in sks[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    return ctx, sks, ckks.SecretKey(acc)


@pytest.fixture(scope="module")
def crp_gen():
    g = CRPGenerator(b"ck", ckks.get_context(PARAMS).ring_qp)
    g.seed(b"seed")
    return g


def fold(proto, shares):
    acc = shares[0]
    for s in shares[1:]:
        acc = proto.aggregate(acc, s)
    return acc


@pytest.fixture(scope="module")
def tools(parties):
    ctx, sks, sk_col = parties
    return {
        "enc": ckks.Encoder(PARAMS),
        "dec": ckks.Decryptor(PARAMS, sk_col),
        "eval": ckks.Evaluator(PARAMS),
        "enc_sk": ckks.Encryptor(PARAMS, sk=sk_col),
    }


def test_ckg(parties, crp_gen, tools):
    ctx, sks, sk_col = parties
    crp = crp_gen.clock_poly()
    ckg = dckks.CKGProtocol(PARAMS)
    pk = ckg.gen_public_key(
        fold(ckg, [ckg.gen_share(sk.sk, crp) for sk in sks]), crp
    )
    v = rand_values()
    ct = ckks.Encryptor(PARAMS, pk=pk).encrypt(tools["enc"].encode(v))
    assert_precision(tools["enc"].decode(tools["dec"].decrypt(ct)), v)


def test_cks(parties, tools):
    ctx, sks, sk_col = parties
    kg2 = ckks.KeyGenerator(PARAMS, rng_key=jax.random.key(999))
    sks_out = [kg2.gen_secret_key() for _ in range(N_PARTIES)]
    acc = sks_out[0].sk
    for s in sks_out[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    v = rand_values()
    ct = tools["enc_sk"].encrypt(tools["enc"].encode(v))
    cks = dckks.CKSProtocol(PARAMS)
    ct2 = cks.key_switch(
        fold(cks, [cks.gen_share(a.sk, b.sk, ct) for a, b in zip(sks, sks_out)]),
        ct,
    )
    dec2 = ckks.Decryptor(PARAMS, ckks.SecretKey(acc))
    assert_precision(tools["enc"].decode(dec2.decrypt(ct2)), v)


def test_cks_at_lower_level(parties, tools):
    ctx, sks, sk_col = parties
    v = rand_values()
    ct = tools["enc_sk"].encrypt(tools["enc"].encode(v))
    ct = tools["eval"].drop_level(ct, 1)
    zero = [ckks.KeyGenerator(PARAMS, rng_key=jax.random.key(50 + i)).gen_secret_key() for i in range(N_PARTIES)]
    acc = zero[0].sk
    for s in zero[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    cks = dckks.CKSProtocol(PARAMS)
    ct2 = cks.key_switch(
        fold(cks, [cks.gen_share(a.sk, b.sk, ct) for a, b in zip(sks, zero)]), ct
    )
    dec2 = ckks.Decryptor(PARAMS, ckks.SecretKey(acc))
    assert ct2.level == ct.level
    assert_precision(tools["enc"].decode(dec2.decrypt(ct2)), v)


def test_pcks(parties, tools):
    ctx, sks, sk_col = parties
    kg2 = ckks.KeyGenerator(PARAMS, rng_key=jax.random.key(444))
    sk_t, pk_t = kg2.gen_key_pair()
    v = rand_values()
    ct = tools["enc_sk"].encrypt(tools["enc"].encode(v))
    pcks = dckks.PCKSProtocol(PARAMS)
    ct2 = pcks.key_switch(
        fold(pcks, [pcks.gen_share(sk.sk, pk_t, ct) for sk in sks]), ct
    )
    dec2 = ckks.Decryptor(PARAMS, sk_t)
    assert_precision(tools["enc"].decode(dec2.decrypt(ct2)), v)


def _stacked_crp(crp_gen, beta):
    import jax.numpy as jnp

    polys = [crp_gen.clock_poly() for _ in range(beta)]
    return (
        jnp.stack([p[0] for p in polys]),
        jnp.stack([p[1] for p in polys]),
    )


def test_rkg(parties, crp_gen, tools):
    ctx, sks, sk_col = parties
    rkg = dckks.RKGProtocol(PARAMS)
    crp = _stacked_crp(crp_gen, PARAMS.beta())
    ephs = [rkg.new_ephemeral_key() for _ in range(N_PARTIES)]
    r1 = fold(rkg, [rkg.gen_share_round_one(ephs[i], sks[i].sk, crp) for i in range(N_PARTIES)])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sks[i].sk, crp) for i in range(N_PARTIES)])
    r3 = fold(rkg, [rkg.gen_share_round_three(r2, ephs[i], sks[i].sk) for i in range(N_PARTIES)])
    rlk = rkg.gen_relinearization_key(r2, r3)

    v0, v1 = rand_values(), rand_values()
    ct0 = tools["enc_sk"].encrypt(tools["enc"].encode(v0))
    ct1 = tools["enc_sk"].encrypt(tools["enc"].encode(v1))
    prod = tools["eval"].mul_relin(ct0, ct1, rlk)
    assert_precision(
        tools["enc"].decode(tools["dec"].decrypt(prod)), v0 * v1, 10
    )


def test_rtg_and_conjugate(parties, crp_gen, tools):
    ctx, sks, sk_col = parties
    rtg = dckks.RTGProtocol(PARAMS)
    rk = ckks.RotationKeys()
    for rot_type, k in (("left", 2), ("conjugate", 0)):
        crp = _stacked_crp(crp_gen, PARAMS.beta())
        shares = [rtg.gen_share(rot_type, k, sk.sk, crp) for sk in sks]
        rtg.finalize(rot_type, k, fold(rtg, shares), crp, rk)
    v = rand_values()
    ct = tools["enc_sk"].encrypt(tools["enc"].encode(v))
    got = tools["enc"].decode(
        tools["dec"].decrypt(tools["eval"].rotate_columns(ct, 2, rk))
    )
    assert_precision(got, np.roll(v, -2), 10)
    got = tools["enc"].decode(
        tools["dec"].decrypt(tools["eval"].conjugate(ct, rk))
    )
    assert_precision(got, np.conj(v), 10)


def test_refresh_restores_level(parties, crp_gen, tools):
    ctx, sks, sk_col = parties
    v = rand_values()
    ct = tools["enc_sk"].encrypt(tools["enc"].encode(v))
    ct = tools["eval"].drop_level(ct, 2)  # simulate consumed levels
    assert ct.level == PARAMS.max_level - 2

    # crs: NTT-domain uniform over full Q
    from lattigo_tpu.ops import samplers

    crs = samplers.uniform_poly(jax.random.key(31337), ctx.ring_q)
    rfp = dckks.RefreshProtocol(PARAMS)
    shares = [
        rfp.gen_shares(sk.sk, N_PARTIES, ct, crs) for sk in sks
    ]
    ct2 = rfp.finalize(ct, crs, fold(rfp, shares))
    assert ct2.level == PARAMS.max_level  # level restored
    assert_precision(tools["enc"].decode(tools["dec"].decrypt(ct2)), v, 10)


def test_rkg_naive(parties, crp_gen, tools):
    """2-round naive relinearization key under the collective pk
    (dckks/relinkey_gen_naive.go:9-199)."""
    ctx, sks, sk_col = parties
    ckg = dckks.CKGProtocol(PARAMS)
    crp = crp_gen.clock_poly()
    pk = ckg.gen_public_key(
        fold(ckg, [ckg.gen_share(sk.sk, crp) for sk in sks]), crp
    )
    rkg = dckks.RKGProtocolNaive(PARAMS)
    r1 = fold(rkg, [rkg.gen_share_round_one(sk.sk, pk) for sk in sks])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sk.sk, pk) for sk in sks])
    rlk = rkg.gen_relinearization_key(r2)

    v0, v1 = rand_values(), rand_values()
    ct0 = tools["enc_sk"].encrypt(tools["enc"].encode(v0))
    ct1 = tools["enc_sk"].encrypt(tools["enc"].encode(v1))
    prod = tools["eval"].mul_relin(ct0, ct1, rlk)
    assert_precision(
        tools["enc"].decode(tools["dec"].decrypt(prod)), v0 * v1, 9
    )


def test_refresh_device_recode_matches_bigint(parties, crp_gen):
    """finalize's centered device basis-extension recode equals the
    reference-exact host big-int path bit for bit."""
    import jax
    import numpy as np

    from lattigo_tpu.ops import samplers

    ctx, sks, sk_col = parties
    refresh = dckks.RefreshProtocol(PARAMS)
    er = ckks.Encryptor(PARAMS, sk=sks[0])
    enc = ckks.Encoder(PARAMS)
    dec = ckks.Decryptor(PARAMS, sks[0])
    rng = np.random.default_rng(21)
    v = rng.uniform(-1, 1, PARAMS.slots).astype(np.complex128)
    ct = ckks.Evaluator(PARAMS).drop_level(er.encrypt(enc.encode(v)), 1)
    crs = samplers.uniform_poly(jax.random.key(123), ctx.ring_q)
    with refresh.using_key(jax.random.key(7)):
        s = refresh.gen_shares(sks[0].sk, 1, ct, crs)
    a = refresh.finalize(ct, crs, s)
    b = refresh.finalize_bigint(ct, crs, s)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert a.level == ctx.ring_q.L - 1
