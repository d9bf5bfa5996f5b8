"""Binary serialization, byte-compatible with the reference's marshalers.

Formats (all big-endian):

* Poly (ring/ring_object.go:161-289): ``[log2(N) u8][#moduli u8]`` then one
  row of N uint64 coefficients per modulus.
* Ciphertext (bfv/marshaler.go:9-60, ckks/marshaler.go adds the scale):
  ``[degree+1 u8][isNTT u8]`` then the polys.
* SecretKey/PublicKey/SwitchingKey/EvaluationKey/RotationKeys mirror
  bfv/marshaler.go:75-443.

This layer doubles as checkpoint/resume (SURVEY.md section 5): every object a
computation needs to persist round-trips through these codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from lattigo_tpu.ops import u64 as u

U64 = u.U64


# -- Poly -------------------------------------------------------------------


def poly_to_bytes(x: U64) -> bytes:
    arr = u.to_u64(x)
    if arr.ndim != 2:
        raise ValueError("poly_to_bytes expects a [L, N] poly")
    L, n = arr.shape
    header = bytes([n.bit_length() - 1, L])
    return header + arr.astype(">u8").tobytes()


def poly_from_bytes(data: bytes) -> tuple[U64, int]:
    """Returns (poly, bytes consumed)."""
    n = 1 << data[0]
    L = data[1]
    count = L * n
    body = np.frombuffer(data[2 : 2 + count * 8], dtype=">u8").reshape(L, n)
    return u.from_u64(body.astype(np.uint64)), 2 + count * 8


# -- Ciphertext / Plaintext -------------------------------------------------


def bfv_ciphertext_to_bytes(ct) -> bytes:
    out = bytes([len(ct.value), 1 if ct.is_ntt else 0])
    for p in ct.value:
        out += poly_to_bytes(p)
    return out


def bfv_ciphertext_from_bytes(data: bytes):
    from lattigo_tpu.models.bfv.elements import Ciphertext

    degree_p1 = data[0]
    is_ntt = data[1] == 1
    polys = []
    ptr = 2
    for _ in range(degree_p1):
        p, inc = poly_from_bytes(data[ptr:])
        polys.append(p)
        ptr += inc
    return Ciphertext(polys, is_ntt)


def ckks_ciphertext_to_bytes(ct) -> bytes:
    """ckks adds the float64 scale to the metadata (ckks/marshaler.go)."""
    out = bytes([len(ct.value), 1 if ct.is_ntt else 0])
    out += struct.pack(">d", ct.scale)
    for p in ct.value:
        out += poly_to_bytes(p)
    return out


def ckks_ciphertext_from_bytes(data: bytes):
    from lattigo_tpu.models.ckks.elements import Ciphertext

    degree_p1 = data[0]
    is_ntt = data[1] == 1
    (scale,) = struct.unpack(">d", data[2:10])
    polys = []
    ptr = 10
    for _ in range(degree_p1):
        p, inc = poly_from_bytes(data[ptr:])
        polys.append(p)
        ptr += inc
    return Ciphertext(polys, scale, is_ntt)


# -- protocol shares (the dbfv/dckks wire protocol) -------------------------


def share_to_bytes(share) -> bytes:
    """Serialize a protocol share: a single poly pair, a stacked
    [beta, L, N] pair, or a tuple of those (PCKS/Refresh two-part shares).
    Format: [kind u8] + payload; kind 0 = poly, 1 = stacked, 2 = tuple."""
    if isinstance(share, tuple) and len(share) == 2 and not hasattr(share[0], "ndim"):
        # tuple of shares
        a = share_to_bytes(share[0])
        b = share_to_bytes(share[1])
        return bytes([2]) + len(a).to_bytes(4, "big") + a + b
    lo = np.asarray(share[0])
    if lo.ndim == 3:  # stacked [beta, L, N]
        out = bytes([1, lo.shape[0]])
        for i in range(lo.shape[0]):
            out += poly_to_bytes((share[0][i], share[1][i]))
        return out
    return bytes([0]) + poly_to_bytes(share)


def share_from_bytes(data: bytes):
    kind = data[0]
    if kind == 0:
        p, _ = poly_from_bytes(data[1:])
        return p
    if kind == 1:
        import jax.numpy as jnp

        beta = data[1]
        ptr = 2
        polys = []
        for _ in range(beta):
            p, inc = poly_from_bytes(data[ptr:])
            polys.append(p)
            ptr += inc
        return (
            jnp.stack([p[0] for p in polys]),
            jnp.stack([p[1] for p in polys]),
        )
    if kind == 2:
        alen = int.from_bytes(data[1:5], "big")
        return (
            share_from_bytes(data[5 : 5 + alen]),
            share_from_bytes(data[5 + alen :]),
        )
    raise ValueError(f"unknown share kind {kind}")


# -- keys -------------------------------------------------------------------


def secret_key_to_bytes(sk) -> bytes:
    return poly_to_bytes(sk.sk)


def secret_key_from_bytes(data: bytes, cls):
    p, _ = poly_from_bytes(data)
    return cls(p)


def public_key_to_bytes(pk) -> bytes:
    return poly_to_bytes(pk.pk[0]) + poly_to_bytes(pk.pk[1])


def public_key_from_bytes(data: bytes, cls):
    p0, inc = poly_from_bytes(data)
    p1, _ = poly_from_bytes(data[inc:])
    return cls((p0, p1))


def switching_key_to_bytes(swk) -> bytes:
    """[beta u8] then per block: key0 poly, key1 poly
    (bfv/marshaler.go:248-273)."""
    beta = swk.key0[0].shape[0]
    out = bytes([beta])
    for i in range(beta):
        out += poly_to_bytes((swk.key0[0][i], swk.key0[1][i]))
        out += poly_to_bytes((swk.key1[0][i], swk.key1[1][i]))
    return out


def switching_key_from_bytes(data: bytes, cls) -> tuple[object, int]:
    import jax.numpy as jnp

    beta = data[0]
    ptr = 1
    k0, k1 = [], []
    for _ in range(beta):
        p0, inc = poly_from_bytes(data[ptr:])
        ptr += inc
        p1, inc = poly_from_bytes(data[ptr:])
        ptr += inc
        k0.append(p0)
        k1.append(p1)
    stack = lambda ps: (
        jnp.stack([p[0] for p in ps]),
        jnp.stack([p[1] for p in ps]),
    )
    return cls(stack(k0), stack(k1)), ptr


def evaluation_key_to_bytes(evk) -> bytes:
    keys = evk.evakey if isinstance(evk.evakey, list) else [evk.evakey]
    out = bytes([len(keys)])
    for swk in keys:
        out += switching_key_to_bytes(swk)
    return out


def evaluation_key_from_bytes(data: bytes, evk_cls, swk_cls, single: bool = False):
    count = data[0]
    ptr = 1
    keys = []
    for _ in range(count):
        swk, inc = switching_key_from_bytes(data[ptr:], swk_cls)
        keys.append(swk)
        ptr += inc
    return evk_cls(keys[0] if single else keys)


# rotation record types (bfv/keygen.go:40-45, ckks/keygen.go:44-49):
# RotationRight = 1, RotationLeft = 2, RotationRow/Conjugate = 3
ROT_RIGHT, ROT_LEFT, ROT_EXTRA = 1, 2, 3


def rotation_keys_to_bytes(rk) -> bytes:
    """Reference RotationKeys format (bfv/marshaler.go:330-385): a stream of
    records ``[type u8][k u24-big-endian]`` + SwitchingKey bytes; the
    row/conjugate record carries k = 0 (the reference leaves those 3 bytes
    zero).  Left keys first, then right, then row/conjugate — the reference
    iterates Go maps (order-free decode), so any order round-trips."""
    extra = getattr(rk, "row", None)
    if extra is None:
        extra = getattr(rk, "conjugate", None)
    out = b""
    for k in sorted(rk.left):
        out += bytes([ROT_LEFT]) + int(k).to_bytes(3, "big")
        out += switching_key_to_bytes(rk.left[k])
    for k in sorted(rk.right):
        out += bytes([ROT_RIGHT]) + int(k).to_bytes(3, "big")
        out += switching_key_to_bytes(rk.right[k])
    if extra is not None:
        out += bytes([ROT_EXTRA, 0, 0, 0])
        out += switching_key_to_bytes(extra)
    return out


def rotation_keys_from_bytes(data: bytes, rk_cls, swk_cls):
    rk = rk_cls()
    ptr = 0
    while ptr < len(data):
        rot_type = data[ptr]
        k = int.from_bytes(data[ptr + 1 : ptr + 4], "big")
        ptr += 4
        swk, inc = switching_key_from_bytes(data[ptr:], swk_cls)
        ptr += inc
        if rot_type == ROT_LEFT:
            rk.left[k] = swk
        elif rot_type == ROT_RIGHT:
            rk.right[k] = swk
        elif rot_type == ROT_EXTRA:
            if hasattr(rk, "row"):
                rk.row = swk
            else:
                rk.conjugate = swk
        else:
            raise ValueError(f"unknown rotation record type {rot_type}")
    return rk


# -- Parameters ---------------------------------------------------------------


def bfv_parameters_to_bytes(p) -> bytes:
    """bfv/params.go:263-285: [logN u8][#Qi u8][#Pi u8][#QiMul u8]
    [T u64][sigma*2^32 u64][Qi...][Pi...][QiMul...], big-endian."""
    out = bytes([p.log_n, len(p.qi), len(p.pi), len(p.qi_mul)])
    out += struct.pack(">QQ", p.t, int(p.sigma * (1 << 32)))
    for v in (*p.qi, *p.pi, *p.qi_mul):
        out += struct.pack(">Q", v)
    return out


def bfv_parameters_from_bytes(data: bytes):
    from lattigo_tpu.models.bfv.params import Parameters

    log_n, n_qi, n_pi, n_mul = data[0], data[1], data[2], data[3]
    t, sig = struct.unpack(">QQ", data[4:20])
    vals = struct.unpack(f">{n_qi + n_pi + n_mul}Q", data[20 : 20 + 8 * (n_qi + n_pi + n_mul)])
    sigma = round((sig / (1 << 32)) * 100) / 100
    return Parameters(
        log_n=log_n,
        t=t,
        sigma=sigma,
        qi=tuple(vals[:n_qi]),
        pi=tuple(vals[n_qi : n_qi + n_pi]),
        qi_mul=tuple(vals[n_qi + n_pi :]),
    )


def ckks_parameters_to_bytes(p) -> bytes:
    """ckks/params.go:269-291: [logN u8][logSlots u8][scale f64][sigma f64]
    [#Qi u8][#Pi u8][Qi...][Pi...], big-endian."""
    out = bytes([p.log_n, p.log_slots])
    out += struct.pack(">dd", p.scale, p.sigma)
    out += bytes([len(p.qi), len(p.pi)])
    for v in (*p.qi, *p.pi):
        out += struct.pack(">Q", v)
    return out


def ckks_parameters_from_bytes(data: bytes):
    from lattigo_tpu.models.ckks.params import Parameters

    log_n, log_slots = data[0], data[1]
    scale, sigma = struct.unpack(">dd", data[2:18])
    n_qi, n_pi = data[18], data[19]
    vals = struct.unpack(f">{n_qi + n_pi}Q", data[20 : 20 + 8 * (n_qi + n_pi)])
    return Parameters(
        log_n=log_n,
        log_slots=log_slots,
        scale=scale,
        sigma=sigma,
        qi=tuple(vals[:n_qi]),
        pi=tuple(vals[n_qi:]),
    )


# -- reference-format protocol share codecs ---------------------------------
#
# Byte-identical to the reference's per-share MarshalBinary wire formats.
# The kind-tagged share_to_bytes/share_from_bytes above predate these and
# remain only for old checkpoints; new code and the golden tests use the
# reference formats below.

ROTATION_RIGHT, ROTATION_LEFT, ROTATION_ROW = 1, 2, 3  # bfv/keygen.go:42-44


def _stacked_polys(share):
    """[beta, L, N] pair -> iterator of [L, N] pairs."""
    for i in range(np.asarray(share[0]).shape[0]):
        yield (share[0][i], share[1][i])


def _stack_pairs(polys):
    import jax.numpy as jnp

    return (
        jnp.stack([p[0] for p in polys]),
        jnp.stack([p[1] for p in polys]),
    )


def ckg_share_to_bytes(share) -> bytes:
    """CKGShare = bare poly (dbfv/publickey_gen.go:21-27)."""
    return poly_to_bytes(share)


def ckg_share_from_bytes(data: bytes):
    return poly_from_bytes(data)[0]


def cks_share_to_bytes(share) -> bytes:
    """CKSShare = bare poly (dbfv/keyswitching.go:20-33)."""
    return poly_to_bytes(share)


def cks_share_from_bytes(data: bytes):
    return poly_from_bytes(data)[0]


def pcks_share_to_bytes(share) -> bytes:
    """PCKSShare = two polys, no header (dbfv/public_keyswitching.go:30-48)."""
    return poly_to_bytes(share[0]) + poly_to_bytes(share[1])


def pcks_share_from_bytes(data: bytes):
    p0, inc = poly_from_bytes(data)
    p1, _ = poly_from_bytes(data[inc:])
    return p0, p1


def rkg_round1_share_to_bytes(share) -> bytes:
    """[beta u8] + beta polys (dbfv/relinkey_gen.go:28-43)."""
    out = bytes([np.asarray(share[0]).shape[0]])
    for p in _stacked_polys(share):
        out += poly_to_bytes(p)
    return out


def rkg_round1_share_from_bytes(data: bytes):
    beta = data[0]
    ptr = 1
    polys = []
    for _ in range(beta):
        p, inc = poly_from_bytes(data[ptr:])
        polys.append(p)
        ptr += inc
    return _stack_pairs(polys)


rkg_round3_share_to_bytes = rkg_round1_share_to_bytes
rkg_round3_share_from_bytes = rkg_round1_share_from_bytes


def rkg_round2_share_to_bytes(share) -> bytes:
    """[beta u8] + beta x (poly0, poly1) (dbfv/relinkey_gen.go:69-95)."""
    s0, s1 = share
    out = bytes([np.asarray(s0[0]).shape[0]])
    for p0, p1 in zip(_stacked_polys(s0), _stacked_polys(s1)):
        out += poly_to_bytes(p0) + poly_to_bytes(p1)
    return out


def rkg_round2_share_from_bytes(data: bytes):
    beta = data[0]
    ptr = 1
    a, b = [], []
    for _ in range(beta):
        p0, inc = poly_from_bytes(data[ptr:])
        ptr += inc
        p1, inc = poly_from_bytes(data[ptr:])
        ptr += inc
        a.append(p0)
        b.append(p1)
    return _stack_pairs(a), _stack_pairs(b)


def rtg_share_to_bytes(k: int, rot_type: int, share) -> bytes:
    """[K u64][Type u64][lenRing u64] + beta polys
    (dbfv/rotkey_gen.go:29-46)."""
    polys = [poly_to_bytes(p) for p in _stacked_polys(share)]
    out = struct.pack(">QQQ", k, rot_type, len(polys[0]))
    return out + b"".join(polys)


def rtg_share_from_bytes(data: bytes):
    """Returns (k, rot_type, stacked share)."""
    k, rot_type, len_ring = struct.unpack(">QQQ", data[:24])
    n_polys = (len(data) - 24) // len_ring
    ptr = 24
    polys = []
    for _ in range(n_polys):
        p, inc = poly_from_bytes(data[ptr:])
        assert inc == len_ring
        polys.append(p)
        ptr += inc
    return int(k), int(rot_type), _stack_pairs(polys)


def refresh_share_to_bytes(share) -> bytes:
    """[lenDecrypt u64][lenRecrypt u64] + decrypt poly + recrypt poly
    (dbfv/public_refresh.go:32-54; dckks identically)."""
    d = poly_to_bytes(share[0])
    r = poly_to_bytes(share[1])
    return struct.pack(">QQ", len(d), len(r)) + d + r


def refresh_share_from_bytes(data: bytes):
    len_d, len_r = struct.unpack(">QQ", data[:16])
    d, _ = poly_from_bytes(data[16 : 16 + len_d])
    r, _ = poly_from_bytes(data[16 + len_d : 16 + len_d + len_r])
    return d, r
