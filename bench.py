"""Headline benchmark: forward NTTs/sec, N=2^13, 60-bit moduli, one chip.

Matches BASELINE.json config #1 (bit-exact vs ring/ntt_test.go semantics —
the same transform validated against ring/test_data golden vectors in
tests/test_ntt_golden.py).  Prints exactly one JSON line on stdout; extra
diagnostics go to stderr.

Baseline target: 1e6 NTTs/sec per chip (BASELINE.md); vs_baseline is
value / 1e6.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from lattigo_tpu.ops.ring import Ring
    from lattigo_tpu.ops import u64 as u

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    n = 8192
    moduli = [576460752303439873, 576460752303702017]  # golden-vector 60-bit pair
    ring = Ring(n, moduli)

    B = 1024  # batch of polynomials; NTTs per call = B * len(moduli)
    rng = np.random.default_rng(0)
    x = rng.integers(0, moduli[0], size=(B, len(moduli), n), dtype=np.uint64)
    x %= np.array(moduli, dtype=np.uint64)[None, :, None]
    X = u.from_u64(x)

    ntt = jax.jit(ring.ntt)
    y = ntt(X)
    jax.block_until_ready(y)

    # correctness cross-check: reference schedule on the CPU backend (its
    # TPU compile is needlessly slow), one sample, bit-exact
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = (jax.device_put(X[0][:1], cpu), jax.device_put(X[1][:1], cpu))
        ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(x0))
    got = u.to_u64((y[0][:1], y[1][:1]))
    assert (ref == got).all(), "fast NTT mismatch vs reference schedule"
    print("bit-exactness cross-check passed", file=sys.stderr)

    # steady-state timing: chain the transform inside one jit so a single
    # device dispatch measures pure device throughput (each python-level
    # call through the remote-TPU tunnel otherwise adds ~ms of latency).
    # A scalar digest is fetched to host each call — the transfer cannot
    # complete before every chained transform has executed, so the timing
    # cannot be inflated by an unreliable async block_until_ready.
    chain = 50

    @jax.jit
    def ntt_chain(z):
        import jax.numpy as jnp

        out = jax.lax.fori_loop(0, chain, lambda _, a: ring.ntt(a), z)
        digest = jnp.sum(out[0], dtype=jnp.uint32) ^ jnp.sum(out[1], dtype=jnp.uint32)
        return out, digest

    z, d = ntt_chain(X)
    _ = int(d)

    calls = 6
    t0 = time.time()
    for _ in range(calls):
        z, d = ntt_chain(z)
        _ = int(d)
    dt = time.time() - t0
    n_ntts = B * len(moduli) * chain * calls
    rate = n_ntts / dt
    print(f"{n_ntts} NTTs in {dt:.3f}s (digest {int(d)})", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "ntt_per_sec_n8192_60bit",
                "value": round(rate, 1),
                "unit": "NTT/s/chip",
                "vs_baseline": round(rate / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
