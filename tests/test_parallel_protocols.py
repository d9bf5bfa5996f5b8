"""Full threshold-protocol suite on the party mesh (VERDICT round-1 item 5).

Every dbfv protocol — CKG, CKS, PCKS, RKG (3 rounds with aggregation
barriers), RTG, Refresh — runs with one party per mesh shard and real noise,
then is verified with the centralized scheme against the summed secret key,
exactly as dbfv/dbfv_test.go does host-side.
"""

import jax
import numpy as np
import pytest

from lattigo_tpu.models import bfv, dbfv
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.parallel import protocols as pp
from lattigo_tpu.parallel.mesh import make_mesh
from lattigo_tpu.utils.prng import CRPGenerator

PARAMS = bfv.Parameters(
    log_n=8, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
).gen_from_log_moduli()
N_PARTIES = 4
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, party=N_PARTIES)


@pytest.fixture(scope="module")
def setup(mesh):
    ctx = bfv.get_context(PARAMS)
    kgens = [bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(50 + i)) for i in range(N_PARTIES)]
    sks = [kg.gen_secret_key() for kg in kgens]
    acc = sks[0].sk
    for s in sks[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    sk_col = bfv.SecretKey(acc)
    crpg = CRPGenerator(b"meshtest", ctx.ring_qp)
    crpg.seed(b"s")
    ckg = dbfv.CKGProtocol(PARAMS, rng_key=jax.random.key(1))
    crp = crpg.clock_poly()
    pk = pp.ckg_mesh(ckg, mesh, [s.sk for s in sks], crp)
    enc = bfv.Encoder(PARAMS)
    encryptor = bfv.Encryptor(PARAMS, pk=pk)
    return ctx, sks, sk_col, pk, enc, encryptor, crpg


def _roundtrip(enc, sk, ct):
    dec = bfv.Decryptor(PARAMS, sk)
    return enc.decode_uint(dec.decrypt(ct))


def test_ckg_mesh_encrypt_decrypt(setup):
    ctx, sks, sk_col, pk, enc, encryptor, _ = setup
    msg = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = encryptor.encrypt(enc.encode_uint(msg))
    np.testing.assert_array_equal(_roundtrip(enc, sk_col, ct), msg)


def test_cks_mesh(setup, mesh):
    ctx, sks, sk_col, pk, enc, encryptor, _ = setup
    msg = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = encryptor.encrypt(enc.encode_uint(msg))
    # switch from the collective key to a fresh target key (per-party target
    # shares, verified under their sum)
    tgt = [bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(70 + i)).gen_secret_key()
           for i in range(N_PARTIES)]
    acc = tgt[0].sk
    for s in tgt[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    cks = dbfv.CKSProtocol(PARAMS, rng_key=jax.random.key(2))
    ct2 = pp.cks_mesh(cks, mesh, [s.sk for s in sks], [s.sk for s in tgt], ct)
    np.testing.assert_array_equal(_roundtrip(enc, bfv.SecretKey(acc), ct2), msg)


def test_pcks_mesh(setup, mesh):
    ctx, sks, sk_col, pk, enc, encryptor, _ = setup
    msg = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = encryptor.encrypt(enc.encode_uint(msg))
    kg_out = bfv.KeyGenerator(PARAMS, rng_key=jax.random.key(90))
    sk_out, pk_out = kg_out.gen_key_pair()
    pcks = dbfv.PCKSProtocol(PARAMS, rng_key=jax.random.key(3))
    ct2 = pp.pcks_mesh(pcks, mesh, [s.sk for s in sks], pk_out, ct)
    np.testing.assert_array_equal(_roundtrip(enc, sk_out, ct2), msg)


def test_rkg_mesh_mul_relin(setup, mesh):
    ctx, sks, sk_col, pk, enc, encryptor, crpg = setup
    rkg = dbfv.RKGProtocol(PARAMS, rng_key=jax.random.key(4))
    crp_blocks = [crpg.clock_poly() for _ in range(PARAMS.beta)]
    import jax.numpy as jnp

    crp = (jnp.stack([c[0] for c in crp_blocks]), jnp.stack([c[1] for c in crp_blocks]))
    rlk = pp.rkg_mesh(rkg, mesh, [s.sk for s in sks], crp)
    ev = bfv.Evaluator(PARAMS)
    a = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    b = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = ev.relinearize(
        ev.mul(encryptor.encrypt(enc.encode_uint(a)), encryptor.encrypt(enc.encode_uint(b))),
        rlk,
    )
    want = (a * b) % np.uint64(PARAMS.t)
    np.testing.assert_array_equal(_roundtrip(enc, sk_col, ct), want)


def test_rtg_mesh_rotation(setup, mesh):
    ctx, sks, sk_col, pk, enc, encryptor, crpg = setup
    rtg = dbfv.RTGProtocol(PARAMS, rng_key=jax.random.key(5))
    crp_blocks = [crpg.clock_poly() for _ in range(PARAMS.beta)]
    import jax.numpy as jnp

    crp = (jnp.stack([c[0] for c in crp_blocks]), jnp.stack([c[1] for c in crp_blocks]))
    rot_keys = bfv.RotationKeys()
    pp.rtg_mesh(rtg, mesh, "left", 1, [s.sk for s in sks], crp, rot_keys)
    msg = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = encryptor.encrypt(enc.encode_uint(msg))
    ev = bfv.Evaluator(PARAMS)
    got = _roundtrip(enc, sk_col, ev.rotate_columns(ct, 1, rot_keys))
    half = PARAMS.n // 2
    want = np.concatenate([np.roll(msg[:half], -1), np.roll(msg[half:], -1)])
    np.testing.assert_array_equal(got, want)


def test_refresh_mesh(setup, mesh):
    ctx, sks, sk_col, pk, enc, encryptor, crpg = setup
    msg = RNG.integers(0, PARAMS.t, PARAMS.n, dtype=np.uint64)
    ct = encryptor.encrypt(enc.encode_uint(msg))
    refresh = dbfv.RefreshProtocol(PARAMS, rng_key=jax.random.key(6))
    crs = crpg.clock_poly()
    ct2 = pp.refresh_mesh(refresh, mesh, [s.sk for s in sks], ct, crs)
    np.testing.assert_array_equal(_roundtrip(enc, sk_col, ct2), msg)


def test_refresh_mesh_dckks(mesh):
    """dckks collective refresh on the party mesh: host-side per-party masks
    (gen_mask_planes) + traced share math under shard_map; level restored and
    precision preserved (dckks/public_refresh.go:44-151)."""
    from lattigo_tpu.models import ckks, dckks
    from lattigo_tpu.ops import samplers

    cparams = ckks.Parameters(
        log_n=8, log_slots=7, scale=float(1 << 32),
        log_qi=(45, 32, 32, 32), log_pi=(45,),
    ).gen_from_log_moduli()
    ctx = ckks.get_context(cparams)
    kgens = [ckks.KeyGenerator(cparams, rng_key=jax.random.key(70 + i))
             for i in range(N_PARTIES)]
    sks = [kg.gen_secret_key() for kg in kgens]
    acc = sks[0].sk
    for s in sks[1:]:
        acc = ctx.ring_qp.add(acc, s.sk)
    sk_col = ckks.SecretKey(acc)

    enc = ckks.Encoder(cparams)
    encryptor = ckks.Encryptor(cparams, sk=sk_col)
    dec = ckks.Decryptor(cparams, sk_col)
    ev = ckks.Evaluator(cparams)
    v = (RNG.uniform(-1, 1, cparams.slots)
         + 1j * RNG.uniform(-1, 1, cparams.slots)).astype(np.complex128)
    ct = ev.drop_level(encryptor.encrypt(enc.encode(v)), 2)
    assert ct.level == cparams.max_level - 2

    crs = samplers.uniform_poly(jax.random.key(999), ctx.ring_q)
    refresh = dckks.RefreshProtocol(cparams, rng_key=jax.random.key(8))
    ct2 = pp.refresh_mesh_dckks(refresh, mesh, [s.sk for s in sks], ct, crs)
    assert ct2.level == cparams.max_level
    err = np.maximum(np.abs(enc.decode(dec.decrypt(ct2)) - v), 1e-16)
    assert np.median(np.log2(1 / err)) >= 10.0
