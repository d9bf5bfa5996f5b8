"""MXU four-step NTT v3 = v2 compute + manual async-DMA ring.

The auto-pipelined BlockSpec path executes DMA and compute additively on
this runtime (lab15 s0 io + lab15 stage deltas sum exactly to the full
kernel time).  v3 runs the same per-block compute inside an explicit
DEPTH-deep DMA ring (lab17 skeleton): fetch block k+1.. while computing
block j and draining block j-1, so the ~950 us of stream time hides under
the ~2.4 ms of compute.

Grid = (L,): per-limb tables ride normal BlockSpecs; the poly-block loop
is an in-kernel fori over an ANY-space HBM ref.
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

import lab15_mxu_v2 as v2

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

DIG, N2 = 8, 128


def _compute_block(n1, P, inverse, consts_ref, m_rows, c_rows, ttab, m_lanes,
                   c_lanes, x, variant=0):
    """The v2 per-block transform: [P, n1, 128] u64-pair -> same, done.

    variant bit 0: per-poly combine+twiddle (skip the [P,8n1,128] stack)
    variant bit 1: cf folded into c_lanes (tables must carry the fold)
    """
    q = mxu_ntt._smem_c(consts_ref, 0)

    def rows_mm(data3):
        d = v2._digitize_sublane(data3, n1)
        outs = []
        for p in range(P):
            o = jax.lax.dot_general(m_rows[0], d[p], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            outs.append(o + c_rows[0])
        st = jnp.stack(outs, axis=0)
        return [st[:, e * n1:(e + 1) * n1, :] for e in range(DIG)]

    def rows_mm_perp(data3):
        """per-poly planes lists: [[p0_e0..], ...] without the big stack."""
        d = v2._digitize_sublane(data3, n1)
        per_p = []
        for p in range(P):
            o = jax.lax.dot_general(m_rows[0], d[p], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o = o + c_rows[0]
            per_p.append([o[e * n1:(e + 1) * n1] for e in range(DIG)])
        return per_p

    def lanes_mm(data3):
        d = v2._digitize_lane(data3).reshape(P * n1, DIG * N2)
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
        v = v2._combine3(planes, consts_ref, q)
        cf = mxu_ntt._smem_c(consts_ref, 3)
        u0 = mxu_ntt._smem_c(consts_ref, 4)
        return modred.bred_add(u.add64(v, cf), q, u0)

    def twiddle2(v):
        tw = (ttab[0, 0], ttab[0, 1])
        tsh = (ttab[0, 2], ttab[0, 3])
        tco = (ttab[0, 4], ttab[0, 5])
        return u.add64(modred.mul_shoup(v, tw, tsh, q), tco)

    if not inverse and (variant & 2):
        # half-block stagger: independent chains let the scheduler overlap
        # half-1's VPU finalize with half-2's MXU lanes matmul
        h = P // 2
        x1 = (x[0][:h], x[1][:h])
        x2 = (x[0][h:], x[1][h:])
        def phase1(xh_):
            dd = v2._digitize_sublane(xh_, n1)
            outs = []
            for p in range(h):
                o = jax.lax.dot_general(m_rows[0], dd[p], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                outs.append(o + c_rows[0])
            st = jnp.stack(outs, axis=0)
            mid_ = [st[:, e * n1:(e + 1) * n1, :] for e in range(DIG)]
            return twiddle(v2._combine3(mid_, consts_ref, q))
        def lanes_mm_h(data3):
            dd = v2._digitize_lane(data3).reshape(h * n1, DIG * N2)
            o = jax.lax.dot_general(dd, m_lanes[0], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            o = (o + c_lanes[0]).reshape(h, n1, DIG * N2)
            return [o[:, :, e * N2:(e + 1) * N2] for e in range(DIG)]
        y1 = phase1(x1)
        y2 = phase1(x2)
        b1 = lanes_mm_h(y1)
        b2 = lanes_mm_h(y2)
        o1 = finalize(b1)
        o2 = finalize(b2)
        return (jnp.concatenate([o1[0], o2[0]], axis=0),
                jnp.concatenate([o1[1], o2[1]], axis=0))

    if not inverse:
        if variant & 1:
            per_p = rows_mm_perp(x)
            ys = [twiddle2(v2._combine3(pl_, consts_ref, q)) for pl_ in per_p]
            y = (jnp.stack([a[0] for a in ys], 0), jnp.stack([a[1] for a in ys], 0))
        else:
            mid = rows_mm(x)
            y = twiddle(v2._combine3(mid, consts_ref, q))
        return finalize(lanes_mm(y))
    mid = lanes_mm(x)
    y = twiddle(v2._combine3(mid, consts_ref, q))
    return finalize(rows_mm(y))


def _kernel_v3(n1, P, nb, depth, inverse, variant, consts_ref, m_rows, c_rows,
               ttab, m_lanes, c_lanes, xl, xh, ol, oh, bil, bih, bol, boh, sin,
               sout):
    l = pl.program_id(0)

    def in_copy(b, slot, w):
        src, dst = (xl, bil) if w == 0 else (xh, bih)
        return pltpu.make_async_copy(
            src.at[pl.ds(b * P, P), l], dst.at[slot], sin.at[slot, w])

    def out_copy(b, slot, w):
        src, dst = (bol, ol) if w == 0 else (boh, oh)
        return pltpu.make_async_copy(
            src.at[slot], dst.at[pl.ds(b * P, P), l], sout.at[slot, w])

    def body(k, _):
        slot = jax.lax.rem(k, depth)

        @pl.when(k < nb)
        def _fetch():
            in_copy(k, slot, 0).start()
            in_copy(k, slot, 1).start()

        j = k - (depth - 1)

        @pl.when(jnp.logical_and(j >= 0, j < nb))
        def _work():
            slot_j = jax.lax.rem(j, depth)
            in_copy(j, slot_j, 0).wait()
            in_copy(j, slot_j, 1).wait()
            out = _compute_block(n1, P, inverse, consts_ref, m_rows, c_rows,
                                 ttab, m_lanes, c_lanes,
                                 (bil[slot_j], bih[slot_j]), variant=variant)

            @pl.when(j >= depth)
            def _wout():
                out_copy(j - depth, slot_j, 0).wait()
                out_copy(j - depth, slot_j, 1).wait()

            bol[slot_j] = out[0]
            boh[slot_j] = out[1]
            out_copy(j, slot_j, 0).start()
            out_copy(j, slot_j, 1).start()

        return 0

    jax.lax.fori_loop(0, nb + depth - 1, body, 0)

    def drain(j, _):
        slot_j = jax.lax.rem(j, depth)
        out_copy(j, slot_j, 0).wait()
        out_copy(j, slot_j, 1).wait()
        return 0

    jax.lax.fori_loop(max(0, nb - depth), nb, drain, 0)


@functools.lru_cache(maxsize=None)
def _build_call_v3(n1, n_limbs, nb, P, depth, inverse, interpret, variant=0):
    kernel = functools.partial(_kernel_v3, n1, P, nb, depth, inverse, variant)
    vm = pltpu.VMEM
    dn1 = DIG * n1
    dn2 = DIG * N2
    limb = lambda l: (l, 0, 0)
    limb4 = lambda l: (l, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_limbs,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda l: (l, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dn1, dn1), limb, memory_space=vm),
            pl.BlockSpec((1, dn1, 1), limb, memory_space=vm),
            pl.BlockSpec((1, 6, n1, N2), limb4, memory_space=vm),
            pl.BlockSpec((1, dn2, dn2), limb, memory_space=vm),
            pl.BlockSpec((1, 1, dn2), limb, memory_space=vm),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P * nb, n_limbs, n1, N2), jnp.uint32),
            jax.ShapeDtypeStruct((P * nb, n_limbs, n1, N2), jnp.uint32),
        ],
        scratch_shapes=[
            vm((depth, P, n1, N2), jnp.uint32),
            vm((depth, P, n1, N2), jnp.uint32),
            vm((depth, P, n1, N2), jnp.uint32),
            vm((depth, P, n1, N2), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


def ntt_mxu_v3(ring, x, limbs, inverse=False, interpret=False, block_polys=16,
               depth=3, variant=0):
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

    call = _build_call_v3(n1, L, nb, P, depth, inverse, interpret, variant)
    olo, ohi = call(t["consts"], t["m_rows"], t["c_rows"], t["ttab"],
                    t["m_lanes"], t["c_lanes"], shape_in(lo), shape_in(hi))
    olo = olo[:B].reshape(*batch, L, n)
    ohi = ohi[:B].reshape(*batch, L, n)
    return olo, ohi


if __name__ == "__main__":
    import os

    N = 8192
    L = 2
    B = int(os.environ.get("LAB_B", "1024"))
    ring = ring_mod.Ring(N, [576460752303439873, 576460752303702017])
    rng = np.random.default_rng(11)
    x = rng.integers(0, ring.moduli[0], size=(B, L, N), dtype=np.uint64)
    x %= np.array(ring.moduli, dtype=np.uint64)[None, :, None]
    X = u.from_u64(x)
    X = (jax.device_put(X[0]), jax.device_put(X[1]))
    modes = sys.argv[1:] or ["check", "v3p16"]
    CHAIN = int(os.environ.get("LAB_CHAIN", "100"))
    CALLS = int(os.environ.get("LAB_CALLS", "2"))

    if "check" in modes:
        f = T.tjit(lambda a: ntt_mxu_v3(ring, a, (0, 1), block_polys=8))
        y = f((jax.jit(lambda a: a[:16])(X[0]), jax.jit(lambda a: a[:16])(X[1])))
        y_np = u.to_u64((np.asarray(y[0]), np.asarray(y[1])))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(
                u.from_u64(x[:16])))
        assert (ref == y_np).all(), "v3 fwd NTT mismatch on device"
        print("v3 fwd bit-exact on device (B=16, 2-block ring)", flush=True)
        g = T.tjit(lambda a: ntt_mxu_v3(ring, a, (0, 1), inverse=True,
                                        block_polys=8))
        z = g(y)
        z_np = u.to_u64((np.asarray(z[0]), np.asarray(z[1])))
        assert (z_np == x[:16]).all(), "v3 inv roundtrip mismatch on device"
        print("v3 inv roundtrip bit-exact on device", flush=True)

    for mode in modes:
        if mode.startswith("var"):
            vr = int(mode[3:])
            per_call, cs = bench.digest_time(
                lambda a, _v=vr: ntt_mxu_v3(ring, a, (0, 1), block_polys=16,
                                            variant=_v),
                X, chain=CHAIN, calls=CALLS, label=mode)
            print(f"{mode}: {per_call*1e6:9.1f} us/call  "
                  f"{B*L/per_call/1e3:8.1f}k NTT/s", flush=True)
        if mode.startswith("v3p"):
            parts = mode[3:].split("d")
            p = int(parts[0])
            depth = int(parts[1]) if len(parts) > 1 else 3
            per_call, cs = bench.digest_time(
                lambda a, _p=p, _d=depth: ntt_mxu_v3(
                    ring, a, (0, 1), block_polys=_p, depth=_d),
                X, chain=CHAIN, calls=CALLS, label=mode)
            print(f"{mode}: {per_call*1e6:9.1f} us/call  "
                  f"{B*L/per_call/1e3:8.1f}k NTT/s", flush=True)
