"""Merged multi-group NTT kernels: several gather groups + roll tail in one
pallas_call, to find the best pass partition."""
import functools, sys, time
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

# ---- multi-group kernel: groups is a tuple of (stages_tuple, is_roll) ----
def _kernel_multi(rows, inverse, groups, first, final, consts_ref, xl, xh_, *rest):
    ts_ref = rest[:-2]
    ol, oh = rest[-2], rest[-1]
    q = _scal(consts_ref, 0)
    two_q = _scal(consts_ref, 1)
    q3 = (q[0].reshape(1, 1, 1), q[1].reshape(1, 1, 1))
    two_q3 = (two_q[0].reshape(1, 1, 1), two_q[1].reshape(1, 1, 1))
    lanes_ = xl.shape[-1]
    x = (xl[0], xh_[0])
    n_ = rows

    if inverse and first:
        x = _fold(_fold(x, two_q), two_q)

    for (group, is_roll), t_ref in zip(groups, ts_ref):
        T = t_ref[0]
        if is_roll:
            row = jax.lax.broadcasted_iota(jnp.int32, (n_, 1), 0)
            for j, t in enumerate(group):
                c0 = 4 * j
                f = (T[:, c0].reshape(n_, 1), T[:, c0 + 1].reshape(n_, 1))
                fs = (T[:, c0 + 2].reshape(n_, 1), T[:, c0 + 3].reshape(n_, 1))
                is_u = (row % (2 * t)) < t
                roll = lambda a, d: (pltpu.roll(a[0], d % n_, axis=0), pltpu.roll(a[1], d % n_, axis=0))
                if not inverse:
                    folded = _fold(x, two_q)
                    mont = modred.mul_shoup(x, f, fs, q)
                    out_u = u.add64(folded, roll(mont, -t))
                    out_v = u.sub64(u.add64(roll(folded, t), two_q), mont)
                else:
                    out_u = _fold(u.add64(x, roll(x, -t)), two_q)
                    diff = u.sub64(u.add64(roll(x, t), two_q), x)
                    out_v = modred.mul_shoup(diff, f, fs, q)
                x = u.select64(is_u, out_u, out_v)
        else:
            t_slice = min(group)
            P = (max(group) * 2) // t_slice
            M = n_ // (P * t_slice)
            x4l = x[0].reshape(M, P, t_slice, lanes_)
            x4h = x[1].reshape(M, P, t_slice, lanes_)
            parts = [(x4l[:, b], x4h[:, b]) for b in range(P)]
            for j, sigma in enumerate(group):
                d = sigma // t_slice
                c0 = 4 * j
                TH = T[: n_ // 2]
                npair = P // 2
                cw = (TH[:, c0].reshape(M, npair, t_slice, 1), TH[:, c0 + 1].reshape(M, npair, t_slice, 1))
                cs = (TH[:, c0 + 2].reshape(M, npair, t_slice, 1), TH[:, c0 + 3].reshape(M, npair, t_slice, 1))
                for a in range(P // (2 * d)):
                    for r in range(d):
                        iu = 2 * a * d + r
                        iv = iu + d
                        pair = a * d + r
                        uu, vv = parts[iu], parts[iv]
                        f = (cw[0][:, pair], cw[1][:, pair])
                        fs = (cs[0][:, pair], cs[1][:, pair])
                        if not inverse:
                            uu = _fold(uu, two_q3)
                            mv = modred.mul_shoup(vv, f, fs, q3)
                            parts[iu] = u.add64(uu, mv)
                            parts[iv] = u.sub64(u.add64(uu, two_q3), mv)
                        else:
                            parts[iu] = _fold(u.add64(uu, vv), two_q3)
                            diff = u.sub64(u.add64(uu, two_q3), vv)
                            parts[iv] = modred.mul_shoup(diff, f, fs, q3)
            lo = jnp.stack([p[0] for p in parts], axis=1).reshape(n_, lanes_)
            hi = jnp.stack([p[1] for p in parts], axis=1).reshape(n_, lanes_)
            x = (lo, hi)

    if final:
        if not inverse:
            u0 = _scal(consts_ref, 2)
            x = modred.bred_add(x, q, u0)
        else:
            ninv = _scal(consts_ref, 3)
            ninv_s = _scal(consts_ref, 4)
            x = modred.cred(modred.mul_shoup(x, ninv, ninv_s, q), q)
    ol[0] = x[0]
    oh[0] = x[1]


@functools.lru_cache(maxsize=None)
def build_multi(n_, n_limbs, n_batches, lanes_, inverse, groups, first, final, rows):
    kernel = functools.partial(_kernel_multi, rows, inverse, groups, first, final)
    grid = (n_limbs * n_batches, n_ // rows)
    vm = pltpu.VMEM
    in_specs = [pl.BlockSpec((1, 1, 16), lambda i, j: (jax.lax.div(i, n_batches), 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rows, lanes_), lambda i, j: (i, j, 0), memory_space=vm),
                pl.BlockSpec((1, rows, lanes_), lambda i, j: (i, j, 0), memory_space=vm)]
    for (group, is_roll) in groups:
        t_rows = rows if is_roll else rows // 2
        in_specs.append(pl.BlockSpec((1, t_rows, 128), lambda i, j: (jax.lax.div(i, n_batches), j, 0), memory_space=vm))
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, rows, lanes_), lambda i, j: (i, j, 0), memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_limbs * n_batches, n_, lanes_), jnp.uint32)] * 2,
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )

def multi_tables(groups):
    return [pn._tables_pass(ring, limbs, False, tuple(g), r) for g, r in groups]

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
    print(f"{name:52s} {per_call*1e3:8.3f} ms  {NTTS/per_call/1e3:8.1f}k NTT/s  (compile {tc:.0f}s)", flush=True)
    return per_call

def plan(name, kcfgs):
    """kcfgs: list of (groups, rows). Builds calls, times the chain."""
    calls = []
    for ki, (groups, rows) in enumerate(kcfgs):
        g = tuple((tuple(gs), r) for gs, r in groups)
        call = build_multi(n, L, nb, lanes, False, g, ki == 0, ki == len(kcfgs) - 1, rows)
        Ts = multi_tables(groups)
        calls.append((call, Ts))
    def run(z):
        cl, ch = z
        for call, Ts in calls:
            cl, ch = call(consts, cl, ch, *Ts)
        return cl, ch
    t = timeit(name, run, XL)
    # bit-exactness vs reference schedule (one sample on this device)
    out = jax.jit(run)(XL)
    def from_lanes(a):
        a = a.reshape(L, nb, n, lanes).swapaxes(-1, -2)
        return a.reshape(L, nb * lanes, n).transpose(1, 0, 2)
    got = u.to_u64((from_lanes(out[0])[:1], from_lanes(out[1])[:1]))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = (jax.device_put(X[0][:1], cpu), jax.device_put(X[1][:1], cpu))
        ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(x0))
    ok = (ref == got).all()
    print(f"    bit-exact: {ok}", flush=True)
    return t

# current prod as 3 multi-kernels (sanity: should match ~7.2ms)
skipplan = lambda *a, **k: None
skipplan("3K: [4096..512]/[256..32]/[16..1]roll (prod)", [
    ([( [4096,2048,1024,512], False)], 8192),
    ([( [256,128,64,32], False)], 1024),
    ([( [16,8,4,2,1], True)], 1024),
])
# 2 kernels: merge the two head groups
skipplan("2K: [4096..512]+[256..32] | [16,8]+[4,2,1]roll", [
    ([([4096,2048,1024,512], False), ([256,128,64,32], False)], 8192),
    ([([16,8], False), ([4,2,1], True)], 1024),
])
# 2 kernels, alternative split
skipplan("2K: [4096..512]+[256..32] | [16..1]roll", [
    ([([4096,2048,1024,512], False), ([256,128,64,32], False)], 8192),
    ([([16,8,4,2,1], True)], 1024),
])

print("--- round 2 plans ---", flush=True)
plan("PA: [4096..512] | [256..32] | [16,8]+[4,2,1]r", [
    ([([4096,2048,1024,512], False)], 8192),
    ([([256,128,64,32], False)], 1024),
    ([([16,8], False), ([4,2,1], True)], 1024),
])
plan("PB: [4096..512] | [256..32]+[16,8] | [4,2,1]r", [
    ([([4096,2048,1024,512], False)], 8192),
    ([([256,128,64,32], False), ([16,8], False)], 1024),
    ([([4,2,1], True)], 1024),
])
plan("PD2: [4096..512] | [256..32]+[16,8]+[4,2,1]r", [
    ([([4096,2048,1024,512], False)], 8192),
    ([([256,128,64,32], False), ([16,8], False), ([4,2,1], True)], 1024),
])
