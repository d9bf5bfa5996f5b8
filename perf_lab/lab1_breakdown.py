"""Round-2 NTT perf lab: attribute the 7ms/2048-NTT cost of the production
3-pass schedule to its components (per-pass kernels, lane transposes)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from lattigo_tpu.ops.ring import Ring
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops import pallas_ntt as pn

n = 8192
moduli = [576460752303439873, 576460752303702017]
ring = Ring(n, moduli)
B = 1024
L = 2
lanes = 128
rng = np.random.default_rng(0)
x = rng.integers(0, moduli[0], size=(B, L, n), dtype=np.uint64)
x %= np.array(moduli, dtype=np.uint64)[None, :, None]
X = u.from_u64(x)
X = jax.device_put(X)

NTTS = B * L  # per call

def timeit(name, fn, *args, chain=20, calls=4):
    @jax.jit
    def chained(z):
        out = jax.lax.fori_loop(0, chain, lambda _, a: fn(a), z)
        d = jnp.sum(out[0], dtype=jnp.uint32) ^ jnp.sum(out[1], dtype=jnp.uint32)
        return out, d
    z, d = chained(*args); _ = int(d)
    t0 = time.time()
    for _ in range(calls):
        z, d = chained(z); _ = int(d)
    dt = time.time() - t0
    per_call = dt / (chain * calls)
    print(f"{name:40s} {per_call*1e3:8.3f} ms/call  -> {NTTS/per_call/1e3:9.1f}k NTT/s", flush=True)
    return per_call

# 1. full production ntt (includes to_lanes/from_lanes each call; XLA may cancel between chain iters)
timeit("prod ntt (api layout, chained)", lambda a: ring.ntt(a), X)

# 2. pure kernel chain on lane-major data (no transposes at all)
limbs = (0, 1)
consts, _ = pn._tables_packed(ring, limbs, False, "gather")
groups = pn._passes(n, False, 4, 32)
nb = B // lanes

def to_lanes(a):
    a = a.reshape(B, L, n).transpose(1, 0, 2).reshape(L, nb, lanes, n)
    return a.swapaxes(-1, -2).reshape(L * nb, n, lanes)

XL = jax.jit(lambda a: (to_lanes(a[0]), to_lanes(a[1])))(X)
jax.block_until_ready(XL)

calls_and_tables = []
for gi, group in enumerate(groups):
    tail = min(group) < 32
    final = gi == len(groups) - 1
    span = 2 * max(group)
    rows = min(n, max(span, 1024))
    T = pn._tables_pass(ring, limbs, False, tuple(group), tail)
    call = pn._build_call_pass(n, L, nb, lanes, False, tuple(group), tail, gi == 0, final, False, rows)
    calls_and_tables.append((call, T, group, rows))
    print(f"  pass {gi}: group={group} rows={rows} tail={tail}", file=sys.stderr)

def kernels_only(z):
    cl, ch = z
    for call, T, _, _ in calls_and_tables:
        cl, ch = call(consts, cl, ch, T)
    return cl, ch

timeit("3-pass kernels only (lane layout)", kernels_only, XL)

# 3. each pass individually (note pass1 input domain differs but cost is representative)
for i, (call, T, group, rows) in enumerate(calls_and_tables):
    timeit(f"  pass{i} {str(group):24s} rows={rows}", lambda z, c=call, t=T: c(consts, z[0], z[1], t), XL)

# 4. transpose cost alone
def roundtrip(z):
    a = z[0].reshape(L, nb, n, lanes).swapaxes(-1, -2).reshape(L, B, n).transpose(1, 0, 2)
    b = z[1].reshape(L, nb, n, lanes).swapaxes(-1, -2).reshape(L, B, n).transpose(1, 0, 2)
    return to_lanes(a), to_lanes(b)
timeit("from_lanes+to_lanes roundtrip", roundtrip, XL)
