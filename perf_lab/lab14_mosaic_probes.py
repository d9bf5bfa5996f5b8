"""Mosaic capability probes for the MXU NTT v2 redesign.

P1: narrowing bitcast u32 -> i8 (x4 lanes) in-kernel, vs reference bytes
P2: true lane<->sublane transpose [64,128] -> [128,64] u32
P3: i8 pack via astype + sublane stack
P4: xor-0x80 bitcast digitize feeding an i8 matmul (semantic check)
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

probes = sys.argv[1:] or ["p1", "p2", "p3", "p4"]

rng = np.random.default_rng(3)


def run(name, kernel, x, out_shape):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        y = jax.jit(f)(x)
        y = np.asarray(y)
        print(f"{name}: OK shape={y.shape} dtype={y.dtype}")
        return y
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


if "p1" in probes:
    x = rng.integers(0, 2**32, (8, 128), dtype=np.uint32)

    def k1(xr, o):
        b = jax.lax.bitcast_convert_type(xr[:], jnp.uint8)  # [8,128,4]
        o[:] = b.reshape(8, 512)

    y = run("p1 bitcast u32->u8x4", k1, x,
            jax.ShapeDtypeStruct((8, 512), jnp.uint8))
    if y is not None:
        ref = x.view(np.uint8).reshape(8, 512)
        print("   bytes match little-endian:", (y == ref).all())

if "p2" in probes:
    x = rng.integers(0, 2**32, (64, 128), dtype=np.uint32)

    def k2(xr, o):
        o[:] = xr[:].T

    y = run("p2 transpose u32 64x128", k2, x,
            jax.ShapeDtypeStruct((128, 64), jnp.uint32))
    if y is not None:
        print("   transpose correct:", (y == x.T).all())

if "p3" in probes:
    x = rng.integers(0, 2**32, (64, 128), dtype=np.uint32)

    def k3(xr, o):
        v = xr[:]
        planes = [((v >> (8 * e)) & 255).astype(jnp.int8) for e in range(4)]
        o[:] = jnp.concatenate(planes, axis=0)  # [256, 128]

    y = run("p3 astype-i8 sublane stack", k3, x,
            jax.ShapeDtypeStruct((256, 128), jnp.int8))
    if y is not None:
        ref = np.concatenate([((x >> (8 * e)) & 255).astype(np.int8)
                              for e in range(4)], axis=0)
        print("   pack correct:", (y == ref).all())

if "p4" in probes:
    x = rng.integers(0, 2**32, (64, 128), dtype=np.uint32)
    m = rng.integers(-128, 128, (512, 512), dtype=np.int8)

    def k4(xr, mr, o):
        v = xr[:] ^ jnp.uint32(0x80808080)
        b = jax.lax.bitcast_convert_type(v, jnp.int8).reshape(64, 512)
        o[:] = jax.lax.dot_general(b, mr[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    try:
        f = pl.pallas_call(
            k4, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int32))
        y = np.asarray(jax.jit(f)(x, m))
        dig = (x.view(np.uint8).reshape(64, 512).astype(np.int32) - 128)
        ref = dig @ m.astype(np.int32)
        print("p4 xor-bitcast matmul: OK, exact:", (y == ref).all())
    except Exception as e:
        print(f"p4: FAILED {type(e).__name__}: {str(e)[:300]}")
