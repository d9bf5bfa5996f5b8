"""MXU four-step NTT v2: relayout-free data choreography.

v1 (ops/mxu_ntt.py) pays Mosaic relayouts in both digitizations:
  rows side: stack-axis0 + reshape merging (P,128) into lanes
  lanes side: stack-axis2 interleave
v2 removes them:
  step A (contract j1, sublanes): digitize planes stacked on SUBLANES
    (astype(i8) pack + axis-1 concat in 3D, matching p3 probe), one
    matmul per poly slice [512,512]@[512,128] (leading-dim slices free)
  step B (contract j2, lanes): digitize planes concatenated on the LANE
    axis in 3D, one matmul [P*64,1024]@[1024,1024]
  twiddle/combine in 3D [P,64,128]; all plane slices are tile-aligned.

Same _tables as v1 (digit order (d-major, j) both sides — matches).

Modes:
  check     interpret-mode + device bit-exactness vs reference schedule
  v2        honest chained timing, P in {8,16}
  v2w       like v2 but single wide dot_general with rank-3 rhs (probe)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from lattigo_tpu import tjit as T
from lattigo_tpu.ops import mxu_ntt, modred
from lattigo_tpu.ops import ring as ring_mod, u64 as u

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

DIG, N2 = 8, 128
_XOR = np.uint32(0x80)


def _digitize_sublane(x3, n1):
    """[P, n1, 128] u64-pair -> [P, 8*n1, 128] i8, rows (d-major, j1)."""
    planes = []
    for w in x3:  # lo, hi
        for e in range(4):
            planes.append((((w >> (8 * e)) & 255) ^ _XOR).astype(jnp.int8))
    return jnp.concatenate(planes, axis=1)


def _digitize_lane(x3):
    """[P, n1, 128] u64-pair -> [P, n1, 8*128] i8, cols (d-major, j2)."""
    planes = []
    for w in x3:
        for e in range(4):
            planes.append((((w >> (8 * e)) & 255) ^ _XOR).astype(jnp.int8))
    return jnp.concatenate(planes, axis=2)


def _combine3(planes, consts_ref, q):
    """8 s32 [P, n1, 128] planes -> u64 pair, lazily reduced < 2^62."""
    pl_u = [p.astype(jnp.uint32) for p in planes]
    z = jnp.zeros_like(pl_u[0])
    lo_v = (pl_u[0], z)
    for e in range(1, 5):
        lo_v = u.add64(lo_v, u.shl64((pl_u[e], z), 8 * e))
    hi_v = (pl_u[5], z)
    for e in range(6, 8):
        hi_v = u.add64(hi_v, u.shl64((pl_u[e], z), 8 * (e - 5)))
    c40 = mxu_ntt._smem_c(consts_ref, 1)
    c40s = mxu_ntt._smem_c(consts_ref, 2)
    return u.add64(lo_v, modred.mul_shoup(hi_v, c40, c40s, q))


def _kernel_v2(n1, P, inverse, wide, consts_ref, xl, xh, m_rows, c_rows, ttab,
               m_lanes, c_lanes, ol, oh, stage=6):
    q = mxu_ntt._smem_c(consts_ref, 0)
    x = (xl[:, 0], xh[:, 0])  # [P, n1, 128]

    def emit(a, b=None):
        ol[:, 0] = a.astype(jnp.uint32) if a.dtype != jnp.uint32 else a
        oh[:, 0] = ol[:, 0] if b is None else (
            b.astype(jnp.uint32) if b.dtype != jnp.uint32 else b)

    if stage == 0:
        emit(x[0] + 1, x[1] + 1)
        return
    if stage == 1:
        d = _digitize_sublane(x, n1)  # [P, 8n1, 128]
        emit(sum(d[:, e * n1:(e + 1) * n1, :].astype(jnp.int32)
                 for e in range(DIG)))
        return

    def rows_mm(data3):
        """matrix-on-left, contract (d, j1) on sublanes, per poly."""
        d = _digitize_sublane(data3, n1)  # [P, 8*n1, 128]
        if wide:
            o = jax.lax.dot_general(m_rows[0], d, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # output [8*n1(out rows), P, 128] -> planes [P, n1, 128]
            o = o + c_rows[0][:, None, :]
            return [jnp.transpose(o[e * n1:(e + 1) * n1], (1, 0, 2))
                    for e in range(DIG)]
        outs = []
        for p in range(P):
            o = jax.lax.dot_general(m_rows[0], d[p], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            outs.append(o + c_rows[0])  # [8*n1, 128]
        st = jnp.stack(outs, axis=0)  # [P, 8*n1, 128]
        return [st[:, e * n1:(e + 1) * n1, :] for e in range(DIG)]

    def lanes_mm(data3):
        """data-on-left, contract (d, j2) on lanes."""
        d = _digitize_lane(data3).reshape(P * n1, DIG * N2)
        o = jax.lax.dot_general(d, m_lanes[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o = (o + c_lanes[0]).reshape(P, n1, DIG * N2)
        return [o[:, :, e * N2:(e + 1) * N2] for e in range(DIG)]

    def twiddle(v):
        tw = (ttab[0, 0][None], ttab[0, 1][None])
        tsh = (ttab[0, 2][None], ttab[0, 3][None])
        tco = (ttab[0, 4][None], ttab[0, 5][None])
        return u.add64(modred.mul_shoup(v, tw, tsh, q), tco)

    def finalize(planes):
        v = _combine3(planes, consts_ref, q)
        cf = mxu_ntt._smem_c(consts_ref, 3)
        u0 = mxu_ntt._smem_c(consts_ref, 4)
        return modred.bred_add(u.add64(v, cf), q, u0)

    if not inverse:
        mid = rows_mm(x)
        if stage == 2:
            emit(sum(p.astype(jnp.uint32) for p in mid))
            return
        y = twiddle(_combine3(mid, consts_ref, q))
        if stage == 3:
            emit(y[0], y[1])
            return
        if stage == 4:
            d = _digitize_lane(y)
            emit(sum(d[:, :, e * N2:(e + 1) * N2].astype(jnp.int32)
                     for e in range(DIG)))
            return
        fin = lanes_mm(y)
        if stage == 5:
            emit(sum(p.astype(jnp.uint32) for p in fin))
            return
        out = finalize(fin)
    else:
        mid = lanes_mm(x)
        y = twiddle(_combine3(mid, consts_ref, q))
        out = finalize(rows_mm(y))
    ol[:, 0] = out[0]
    oh[:, 0] = out[1]


@functools.lru_cache(maxsize=None)
def _build_call_v2(n1, n_limbs, n_blocks, P, inverse, wide, interpret, stage=6):
    kernel = functools.partial(_kernel_v2, n1, P, inverse, wide, stage=stage)
    vm = pltpu.VMEM
    dn1 = DIG * n1
    dn2 = DIG * N2
    limb = lambda l, b: (l, 0, 0)
    limb4 = lambda l, b: (l, 0, 0, 0)
    blk = lambda l, b: (b, l, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_limbs, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda l, b: (l, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((1, dn1, dn1), limb, memory_space=vm),
            pl.BlockSpec((1, dn1, 1), limb, memory_space=vm),
            pl.BlockSpec((1, 6, n1, N2), limb4, memory_space=vm),
            pl.BlockSpec((1, dn2, dn2), limb, memory_space=vm),
            pl.BlockSpec((1, 1, dn2), limb, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
            pl.BlockSpec((P, 1, n1, N2), blk, memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P * n_blocks, n_limbs, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((P * n_blocks, n_limbs, n1, N2), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


def ntt_mxu_v2(ring, x, limbs, inverse=False, interpret=False, block_polys=16,
               wide=False, stage=6):
    lo, hi = x
    batch = lo.shape[:-2]
    L = lo.shape[-2]
    n = ring.n
    n1 = n // N2
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    P = min(block_polys, max(1, B))
    pad = (-B) % P
    nb = (B + pad) // P
    t = mxu_ntt._tables(ring, tuple(limbs), inverse)

    def shape_in(a):
        a = a.reshape(B, L, n1, N2)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, L, n1, N2), dtype=a.dtype)], axis=0)
        return a

    call = _build_call_v2(n1, L, nb, P, inverse, wide, interpret, stage)
    olo, ohi = call(t["consts"], shape_in(lo), shape_in(hi), t["m_rows"],
                    t["c_rows"], t["ttab"], t["m_lanes"], t["c_lanes"])
    olo = olo[:B].reshape(*batch, L, n)
    ohi = ohi[:B].reshape(*batch, L, n)
    return olo, ohi


if __name__ == "__main__":
    import os

    N = 8192
    L = 2
    B = int(os.environ.get("LAB_B", "256"))
    ring = ring_mod.Ring(N, [576460752303439873, 576460752303702017])
    rng = np.random.default_rng(11)
    x = rng.integers(0, ring.moduli[0], size=(B, L, N), dtype=np.uint64)
    x %= np.array(ring.moduli, dtype=np.uint64)[None, :, None]
    X = u.from_u64(x)
    X = (jax.device_put(X[0]), jax.device_put(X[1]))
    modes = sys.argv[1:] or ["check", "v2"]

    if "checki" in modes:
        # interpret-mode check on CPU (small B)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            Xi = u.from_u64(x[:4])
            y = ntt_mxu_v2(ring, Xi, (0, 1), interpret=True, block_polys=4)
            ref = u.to_u64(jax.jit(
                lambda a: ring._ntt_simple(a, (0, 1)))(Xi))
            assert (u.to_u64((np.asarray(y[0]), np.asarray(y[1]))) == ref).all(), "fwd mismatch"
            z = ntt_mxu_v2(ring, jax.tree.map(jnp.asarray, y), (0, 1),
                           inverse=True, interpret=True, block_polys=4)
            assert (u.to_u64((np.asarray(z[0]), np.asarray(z[1]))) == x[:4]).all(), "inv mismatch"
        print("interpret-mode bit-exact (fwd + inv)", flush=True)

    if "check" in modes:
        f = T.tjit(lambda a: ntt_mxu_v2(ring, a, (0, 1), block_polys=8))
        y = f((jax.jit(lambda a: a[:8])(X[0]), jax.jit(lambda a: a[:8])(X[1])))
        y_np = u.to_u64((np.asarray(y[0]), np.asarray(y[1])))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(
                u.from_u64(x[:8])))
        assert (ref == y_np).all(), "v2 fwd NTT mismatch on device"
        print("v2 fwd bit-exact on device", flush=True)
        g = T.tjit(lambda a: ntt_mxu_v2(ring, a, (0, 1), inverse=True,
                                        block_polys=8))
        z = g(y)
        z_np = u.to_u64((np.asarray(z[0]), np.asarray(z[1])))
        assert (z_np == x[:8]).all(), "v2 inv roundtrip mismatch on device"
        print("v2 inv roundtrip bit-exact on device", flush=True)

    CHAIN = int(os.environ.get("LAB_CHAIN", "20"))
    CALLS = int(os.environ.get("LAB_CALLS", "4"))
    for mode in modes:
        if mode.startswith("s") and mode[1:].isdigit():
            st = int(mode[1:])
            per_call, cs = bench.digest_time(
                lambda a, _s=st: ntt_mxu_v2(ring, a, (0, 1), block_polys=16,
                                            stage=_s),
                X, chain=CHAIN, calls=CALLS, label=mode)
            print(f"{mode}: {per_call*1e6:9.1f} us/call  "
                  f"({per_call/(B*L)*1e6:5.2f} us/limb-NTT)", flush=True)
        if mode.startswith("v2p"):
            p = int(mode[3:])
            per_call, cs = bench.digest_time(
                lambda a, _p=p: ntt_mxu_v2(ring, a, (0, 1), block_polys=_p),
                X, chain=CHAIN, calls=CALLS, label=mode)
            print(f"{mode}: {per_call*1e6:9.1f} us/call  "
                  f"{B*L/per_call/1e3:8.1f}k NTT/s", flush=True)
        if mode == "v2w":
            per_call, cs = bench.digest_time(
                lambda a: ntt_mxu_v2(ring, a, (0, 1), block_polys=16, wide=True),
                X, chain=CHAIN, calls=CALLS, label=mode)
            print(f"{mode}: {per_call*1e6:9.1f} us/call  "
                  f"{B*L/per_call/1e3:8.1f}k NTT/s", flush=True)
    if "v2" in modes:
        for p in (8, 16):
            per_call, cs = bench.digest_time(
                lambda a, _p=p: ntt_mxu_v2(ring, a, (0, 1), block_polys=_p),
                X, chain=CHAIN, calls=CALLS, label=f"v2 P={p}")
            print(f"v2 P={p}: {per_call*1e6:9.1f} us/call  "
                  f"{B*L/per_call/1e3:8.1f}k NTT/s", flush=True)
