"""Gather passes with SMEM scalar twiddles (valid when each (stage, pair)
has one twiddle, i.e. M == 1 and group-span >= part coverage)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.ops import modred, u64 as u
from lattigo_tpu.ops import pallas_ntt as pn

n = 8192
moduli = [576460752303439873, 576460752303702017]
ring = Ring(n, moduli)
B, L, lanes = 1024, 2, 128
rng = np.random.default_rng(0)
xh = rng.integers(0, moduli[0], size=(B, L, n), dtype=np.uint64)
xh %= np.array(moduli, dtype=np.uint64)[None, :, None]
X = u.from_u64(xh)
limbs = (0, 1)
nb = B // lanes
NTTS = B * L

def to_lanes(a):
    a = a.reshape(B, L, n).transpose(1, 0, 2).reshape(L, nb, lanes, n)
    return a.swapaxes(-1, -2).reshape(L * nb, n, lanes)
XL = jax.jit(lambda a: (to_lanes(a[0]), to_lanes(a[1])))(X)
jax.block_until_ready(XL)
consts, _ = pn._tables_packed(ring, limbs, False, "gather")
_scal, _fold = pn._scal, pn._fold

def scalar_tw_tables(group, rows):
    """Per (stage j, pair index) scalar twiddles, laid out [L, n_scal, 4]
    where n_scal = sum over stages of (#pairs). Pair (a, r) at stage sigma
    with t_slice rows/part: twiddle = psi[m + group_index], group_index =
    global group of the V part's rows. Requires rows == P * t_slice (M=1)."""
    plain, shoup = ring.shoup_twiddles(False)
    plain, shoup = plain[np.array(limbs)], shoup[np.array(limbs)]
    t_slice = min(group)
    P = (max(group) * 2) // t_slice
    assert rows == P * t_slice, "M must be 1"
    scal = []  # per stage: list of (w, ws) arrays [L]
    layout = []
    for sigma in group:
        m = n // (2 * sigma)          # global group count for this stage
        gs_per_block = rows // (2 * sigma)  # groups per row-block (must be >=1)
        assert gs_per_block >= 1
        d = sigma // t_slice
        pairs = []
        for a in range(P // (2 * d)):
            for r in range(d):
                iu = 2 * a * d + r
                # V rows start at part iu rows [iu*t_slice ...]; group index
                # within block = (iu*t_slice) // (2*sigma); global = m + block_row_group
                g_in_block = (iu * t_slice) // (2 * sigma)
                pairs.append(g_in_block)
        layout.append((sigma, pairs))
        scal.append(pairs)
    n_scal = sum(len(p) for _, p in layout)
    # grid handles (rows)-blocks: block j covers global groups offset j*(rows/(2 sigma))
    # -> twiddle depends on grid j! pass full per-stage scalar ROWS: for stage sigma,
    # block j pair k: twiddle index = m + j*gs + pairs[k]. Store the whole [L, n//rows blocks, n_scal, 4]?
    blocks = n // rows
    T = np.zeros((L, blocks, n_scal, 4), dtype=np.uint32)
    for bj in range(blocks):
        off = 0
        for sigma, pairs in layout:
            m = n // (2 * sigma)
            gs = rows // (2 * sigma)
            for k, g in enumerate(pairs):
                idx = m + bj * gs + g
                for li in range(L):
                    w = int(plain[li, idx]); ws = int(shoup[li, idx])
                    T[li, bj, off + k] = (w & 0xFFFFFFFF, (w >> 32), ws & 0xFFFFFFFF, ws >> 32)
            off += len(pairs)
    return T, layout

def _kernel_scal(rows, group, layout, first, final, consts_ref, tw_ref, xl, xh_, ol, oh):
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)
    q3 = (q[0].reshape(1, 1), q[1].reshape(1, 1))
    two_q3 = (two_q[0].reshape(1, 1), two_q[1].reshape(1, 1))
    lanes_ = xl.shape[-1]
    t_slice = min(group)
    P = (max(group) * 2) // t_slice
    x2l = xl[0].reshape(P, t_slice, lanes_)
    x2h = xh_[0].reshape(P, t_slice, lanes_)
    parts = [(x2l[b], x2h[b]) for b in range(P)]
    off = 0
    for sigma, pairs in layout:
        d = sigma // t_slice
        k = 0
        for a in range(P // (2 * d)):
            for r in range(d):
                iu = 2 * a * d + r
                iv = iu + d
                w = (tw_ref[0, 0, off + k, 0].reshape(1, 1), tw_ref[0, 0, off + k, 1].reshape(1, 1))
                ws = (tw_ref[0, 0, off + k, 2].reshape(1, 1), tw_ref[0, 0, off + k, 3].reshape(1, 1))
                uu, vv = parts[iu], parts[iv]
                uu = _fold(uu, two_q3)
                mv = modred.mul_shoup(vv, w, ws, q3)
                parts[iu] = u.add64(uu, mv)
                parts[iv] = u.sub64(u.add64(uu, two_q3), mv)
                k += 1
        off += len(pairs)
    if final:
        u0 = _scal(consts_ref, 2)
        parts = [modred.bred_add(p, q3, (u0[0].reshape(1,1), u0[1].reshape(1,1))) for p in parts]
    lo = jnp.stack([p[0] for p in parts], axis=0).reshape(rows, lanes_)
    hi = jnp.stack([p[1] for p in parts], axis=0).reshape(rows, lanes_)
    ol[0] = lo
    oh[0] = hi

@functools.lru_cache(maxsize=None)
def build_scal(group, rows, first, final):
    T, layout = scalar_tw_tables(list(group), rows)
    n_scal = T.shape[2]
    kernel = functools.partial(_kernel_scal, rows, list(group), layout, first, final)
    grid = (L * nb, n // rows)
    vm = pltpu.VMEM
    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i, j: (jax.lax.div(i, nb), 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_scal, 4), lambda i, j: (jax.lax.div(i, nb), j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, lanes), lambda i, j: (i, j, 0), memory_space=vm),
            pl.BlockSpec((1, rows, lanes), lambda i, j: (i, j, 0), memory_space=vm),
        ],
        out_specs=[pl.BlockSpec((1, rows, lanes), lambda i, j: (i, j, 0), memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((L * nb, n, lanes), jnp.uint32)] * 2,
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call, T

def timeit(name, fn, z, chain=20, calls=3):
    @jax.jit
    def chained(z):
        out = jax.lax.fori_loop(0, chain, lambda _, a: fn(a), z)
        d = jnp.sum(out[0], dtype=jnp.uint32) ^ jnp.sum(out[1], dtype=jnp.uint32)
        return out, d
    t0c = time.time(); z2, d = chained(z); _ = int(d); tc = time.time()-t0c
    t0 = time.time()
    for _ in range(calls):
        z2, d = chained(z2); _ = int(d)
    per_call = (time.time()-t0) / (chain*calls)
    print(f"{name:48s} {per_call*1e3:8.3f} ms  {NTTS/per_call/1e3:8.1f}k NTT/s  (compile {tc:.0f}s)", flush=True)
    return per_call

# X1: pass1 with scalar twiddles, full span
call1, T1 = build_scal((4096, 2048, 1024, 512), 8192, True, False)
timeit("X1 [4096..512] scalar-tw rows=8192", lambda z: call1(consts, T1, z[0], z[1]), XL)
# X2: pass2 with scalar twiddles, rows=512 (M=1)
call2, T2 = build_scal((256, 128, 64, 32), 512, False, False)
timeit("X2 [256..32] scalar-tw rows=512", lambda z: call2(consts, T2, z[0], z[1]), XL)
# X3: pass3 gather part [16,8] scalar, rows=32?? M=1 requires rows=P*t_slice=4*8=32 rows -> too small; skip
# correctness of X1+X2 vs vector-twiddle equivalents:
Tv1 = pn._tables_pass(ring, limbs, False, (4096, 2048, 1024, 512), False)
cv1 = pn._build_call_pass(n, L, nb, lanes, False, (4096, 2048, 1024, 512), False, True, False, False, 8192)
o_s = jax.jit(lambda z: call1(consts, T1, z[0], z[1]))(XL)
o_v = jax.jit(lambda z: cv1(consts, z[0], z[1], Tv1))(XL)
print("X1 bit-exact vs vector-tw:", bool((np.asarray(o_s[0]) == np.asarray(o_v[0])).all() and (np.asarray(o_s[1]) == np.asarray(o_v[1])).all()), flush=True)
Tv2 = pn._tables_pass(ring, limbs, False, (256, 128, 64, 32), False)
cv2 = pn._build_call_pass(n, L, nb, lanes, False, (256, 128, 64, 32), False, False, False, False, 1024)
o_s2 = jax.jit(lambda z: call2(consts, T2, o_s[0], o_s[1]))(XL)
o_v2 = jax.jit(lambda z: cv2(consts, o_v[0], o_v[1], Tv2))(XL)
print("X2 bit-exact vs vector-tw:", bool((np.asarray(o_s2[0]) == np.asarray(o_v2[0])).all() and (np.asarray(o_s2[1]) == np.asarray(o_v2[1])).all()), flush=True)
