import sys, time
import numpy as np
import jax, jax.numpy as jnp
from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops import pallas_ntt as pn

n = 8192
moduli = [576460752303439873, 576460752303702017]
ring = Ring(n, moduli)
B, L, lanes = 1024, 2, 128
rng = np.random.default_rng(0)
x = rng.integers(0, moduli[0], size=(B, L, n), dtype=np.uint64)
x %= np.array(moduli, dtype=np.uint64)[None, :, None]
X = u.from_u64(x)
limbs = (0, 1)
nb = B // lanes
NTTS = B * L

def to_lanes(a):
    a = a.reshape(B, L, n).transpose(1, 0, 2).reshape(L, nb, lanes, n)
    return a.swapaxes(-1, -2).reshape(L * nb, n, lanes)
XL = jax.jit(lambda a: (to_lanes(a[0]), to_lanes(a[1])))(X)
jax.block_until_ready(XL)
consts, _ = pn._tables_packed(ring, limbs, False, "gather")

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
    print(f"{name:44s} {per_call*1e3:8.3f} ms  {NTTS/per_call/1e3:8.1f}k NTT/s  (compile {tc:.0f}s)", flush=True)
    return per_call

def one_pass(group, rows, tail, first=True, final=False):
    T = pn._tables_pass(ring, limbs, False, tuple(group), tail)
    call = pn._build_call_pass(n, L, nb, lanes, False, tuple(group), tail, first, final, False, rows)
    return lambda z: call(consts, z[0], z[1], T)

timeit("[16,8] gather rows=1024", one_pass([16,8], 1024, False), XL)
timeit("[16,8,4] gather rows=1024", one_pass([16,8,4], 1024, False), XL)
timeit("[16,8,4,2] gather rows=1024", one_pass([16,8,4,2], 1024, False), XL)
timeit("[4,2,1] roll rows=1024", one_pass([4,2,1], 1024, True), XL)
timeit("[2,1] roll rows=1024", one_pass([2,1], 1024, True), XL)
timeit("[1] roll rows=1024", one_pass([1], 1024, True), XL)
timeit("[512] gather rows=1024 (2-part)", one_pass([512], 1024, False), XL)
timeit("[512,256] gather rows=1024", one_pass([512,256], 1024, False), XL)
