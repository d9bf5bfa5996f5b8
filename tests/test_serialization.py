"""Marshaler round-trip tests (mirror of bfv/ckks marshal tests + the
byte-format pin of ring/ring_object.go)."""

import numpy as np

from lattigo_tpu.models import bfv, ckks
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.utils import serialization as ser

BP = bfv.Parameters(
    log_n=8, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
).gen_from_log_moduli()
CP = ckks.Parameters(
    log_n=8, log_slots=7, scale=float(1 << 32), log_qi=(45, 32, 32), log_pi=(45,)
).gen_from_log_moduli()


def test_poly_byte_format():
    """Pin the exact reference byte layout (ring/ring_object.go:161-175)."""
    arr = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.uint64)
    data = ser.poly_to_bytes(u.from_u64(arr))
    assert data[0] == 2  # log2(N)
    assert data[1] == 2  # moduli
    assert data[2:10] == (1).to_bytes(8, "big")
    assert data[10:18] == (2).to_bytes(8, "big")
    back, consumed = ser.poly_from_bytes(data)
    assert consumed == len(data)
    np.testing.assert_array_equal(u.to_u64(back), arr)


def test_bfv_ciphertext_roundtrip():
    kg = bfv.KeyGenerator(BP)
    sk, pk = kg.gen_key_pair()
    enc = bfv.Encoder(BP)
    m = np.arange(BP.n, dtype=np.uint64) % BP.t
    ct = bfv.Encryptor(BP, pk=pk).encrypt(enc.encode_uint(m))
    data = ser.bfv_ciphertext_to_bytes(ct)
    back = ser.bfv_ciphertext_from_bytes(data)
    for a, b in zip(ct.value, back.value):
        np.testing.assert_array_equal(u.to_u64(a), u.to_u64(b))
    got = enc.decode_uint(bfv.Decryptor(BP, sk).decrypt(back))
    np.testing.assert_array_equal(got, m)


def test_ckks_ciphertext_roundtrip():
    kg = ckks.KeyGenerator(CP)
    sk, pk = kg.gen_key_pair()
    enc = ckks.Encoder(CP)
    v = np.linspace(-1, 1, CP.slots).astype(np.complex128)
    ct = ckks.Encryptor(CP, pk=pk).encrypt(enc.encode(v))
    back = ser.ckks_ciphertext_from_bytes(ser.ckks_ciphertext_to_bytes(ct))
    assert back.scale == ct.scale and back.is_ntt
    got = enc.decode(ckks.Decryptor(CP, sk).decrypt(back))
    assert np.median(np.abs(got - v)) < 1e-3


def test_key_roundtrips():
    kg = bfv.KeyGenerator(BP)
    sk, pk = kg.gen_key_pair()
    back_sk = ser.secret_key_from_bytes(ser.secret_key_to_bytes(sk), bfv.SecretKey)
    np.testing.assert_array_equal(u.to_u64(back_sk.sk), u.to_u64(sk.sk))
    back_pk = ser.public_key_from_bytes(ser.public_key_to_bytes(pk), bfv.PublicKey)
    np.testing.assert_array_equal(u.to_u64(back_pk.pk[0]), u.to_u64(pk.pk[0]))

    rlk = kg.gen_relin_key(sk, 1)
    back = ser.evaluation_key_from_bytes(
        ser.evaluation_key_to_bytes(rlk), bfv.EvaluationKey, bfv.SwitchingKey
    )
    np.testing.assert_array_equal(
        u.to_u64(back.evakey[0].key0), u.to_u64(rlk.evakey[0].key0)
    )

    rk = bfv.RotationKeys()
    kg.gen_rot("left", sk, 3, rk)
    kg.gen_rot("row", sk, 0, rk)
    back = ser.rotation_keys_from_bytes(
        ser.rotation_keys_to_bytes(rk), bfv.RotationKeys, bfv.SwitchingKey
    )
    assert 3 in back.left and back.row is not None
    np.testing.assert_array_equal(
        u.to_u64(back.left[3].key1), u.to_u64(rk.left[3].key1)
    )


def test_parameters_roundtrip():
    """bfv/params.go:263-321 + ckks/params.go:269-311 byte formats."""
    from lattigo_tpu.models import bfv, ckks
    from lattigo_tpu.utils import serialization as ser

    p = bfv.Parameters(
        log_n=8, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
    ).gen_from_log_moduli()
    blob = ser.bfv_parameters_to_bytes(p)
    q = ser.bfv_parameters_from_bytes(blob)
    assert (q.log_n, q.t, q.qi, q.pi, q.qi_mul) == (p.log_n, p.t, p.qi, p.pi, p.qi_mul)
    assert q.sigma == p.sigma
    # header layout: logN, #Qi, #Pi, #QiMul then T u64 (big-endian)
    assert blob[0] == 8 and blob[1] == 2 and blob[2] == 1 and blob[3] == 2
    assert int.from_bytes(blob[4:12], "big") == 65537

    cp = ckks.Parameters(
        log_n=8, log_slots=7, scale=2.0**30, log_qi=(40, 30, 30), log_pi=(41,)
    ).gen_from_log_moduli()
    blob = ser.ckks_parameters_to_bytes(cp)
    cq = ser.ckks_parameters_from_bytes(blob)
    assert (cq.log_n, cq.log_slots, cq.scale, cq.qi, cq.pi) == (
        cp.log_n, cp.log_slots, cp.scale, cp.qi, cp.pi,
    )
