"""WEAK_SCALING_r04 evidence (BASELINE.md weak-scaling target).

Three measurements, merged into WEAK_SCALING_r04.json:

1. ``tpu_batch_curve`` — single REAL chip: CKKS ct-ct mul+relin throughput
   vs batch 1..128 (PN12QP109).  This is the per-chip datapoint of a
   data-parallel multi-chip deployment: each chip of an n-chip mesh runs
   exactly this program on its shard, and the curve shows at what
   per-device batch the chip saturates.
2. ``virtual_mesh`` — 8 virtual CPU devices: the SAME sharded program at
   n = 1, 2, 4, 8 devices with fixed batch/device (classic weak scaling).
3. ``virtual_control`` — the same TOTAL batch on ONE virtual device.  On a
   single host, virtual devices share physical cores, so raw virtual-mesh
   "efficiency" conflates host contention with communication cost (the
   round-2 artifact's 22% number).  The controlled efficiency
   thr_sharded(n) / thr_control(same total batch) isolates what the
   sharding itself costs: collectives, replication, partition overhead.

Run: ``python perf_lab/record_weak_scaling_r04.py`` (spawns one subprocess
per backend phase).  Anchor: examples/dbfv/pir/pir.go:293-331 (the
reference's goroutine fan-out this maps onto the mesh data axis).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


PHASE_TPU = r"""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
from lattigo_tpu import tjit as T
from lattigo_tpu.models import ckks

params = ckks.default_params(ckks.PN12QP109)
kg = ckks.KeyGenerator(params, rng_key=jax.random.key(1))
sk, pk = kg.gen_key_pair_sparse(hw=64)
rlk = kg.gen_relin_key(sk)
enc = ckks.Encoder(params)
er = ckks.Encryptor(params, pk=pk)
ev = ckks.Evaluator(params)
rng = np.random.default_rng(0)
v = rng.uniform(-1, 1, params.slots).astype(np.complex128)
ct = er.encrypt(enc.encode(v))
scale = ct.scale

# Timing discipline (PERF_NOTES.md): the runtime is lazy and caches
# repeated (program, buffers) executions; every timed call reads back an
# on-device digest and uses a content-distinct input no execution has seen.
roller = jax.jit(lambda c, k: jax.tree_util.tree_map(
    lambda a: jnp.roll(a, k, axis=-1), c))
digest = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))
def force(out):
    return int(digest(jax.tree_util.tree_leaves(out)[0]))

mk_batch = T.tjit(lambda c, B: jax.tree_util.tree_map(
    lambda a: jnp.stack([jnp.roll(a, i, axis=-1) for i in range(B)]), c))
step = T.tjit(lambda c0, c1, k, s: ev.mul_relin(
    ckks.Ciphertext([c0, c1], s), ckks.Ciphertext([c0, c1], s), k))

curve = {}
for B in (1, 4, 16, 64, 128):
    base = mk_batch(ct.value, B)
    variants = [roller(base, jnp.int32(1000 + i)) for i in range(7)]
    force(step(variants[0][0], variants[0][1], rlk, scale))
    t0 = time.time()
    for mv in variants[1:]:
        force(step(mv[0], mv[1], rlk, scale))
    thr = B * (len(variants) - 1) / (time.time() - t0)
    curve[str(B)] = round(thr, 2)
    print(f"B={B}: {thr:.1f} mul/s", file=sys.stderr, flush=True)
print(json.dumps({"tpu_batch_curve_mul_per_s": curve,
                  "params": "PN12QP109", "device": str(jax.devices()[0]),
                  "discipline": "digest-forced, all-distinct rolled inputs"}))
"""


PHASE_CPU = r"""
import json, sys, time
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from lattigo_tpu.models import ckks
from lattigo_tpu.parallel.scaling import build_mul_step, make_ct_batch
from lattigo_tpu.parallel.mesh import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

params = ckks.default_params(ckks.PN12QP109)
kg = ckks.KeyGenerator(params, rng_key=jax.random.key(1))
sk, pk = kg.gen_key_pair_sparse(hw=64)
rlk = kg.gen_relin_key(sk)
enc = ckks.Encoder(params)
er = ckks.Encryptor(params, pk=pk)
rng = np.random.default_rng(0)
step = build_mul_step(params, rlk)
B0 = 2  # batch per device
ITERS = 6

def run(n_dev, total_B):
    mesh = make_mesh(n_dev, party=1)
    a0, a1, scale = make_ct_batch(params, er, enc, total_B, rng)
    b0, b1, _ = make_ct_batch(params, er, enc, total_B, rng)
    shard = NamedSharding(mesh, P("data"))
    put = lambda t: (jax.device_put(t[0], shard), jax.device_put(t[1], shard))
    a0, a1, b0, b1 = put(a0), put(a1), put(b0), put(b1)
    f = jax.jit(lambda x0, x1, y0, y1: step(x0, x1, y0, y1, scale, scale))
    out = f(a0, a1, b0, b1); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = f(a0, a1, b0, b1)
    jax.block_until_ready(out)
    return total_B * ITERS / (time.time() - t0)

mesh_thr, control_thr = {}, {}
for n in (1, 2, 4, 8):
    mesh_thr[str(n)] = round(run(n, B0 * n), 2)
    print(f"mesh n={n}: {mesh_thr[str(n)]} mul/s", file=sys.stderr, flush=True)
    control_thr[str(n)] = round(run(1, B0 * n), 2)
    print(f"ctrl n={n}: {control_thr[str(n)]} mul/s", file=sys.stderr, flush=True)

eff_raw = {n: round(mesh_thr[n] / (int(n) * mesh_thr["1"]), 3) for n in mesh_thr}
eff_ctl = {n: round(mesh_thr[n] / control_thr[n], 3) for n in mesh_thr}
print(json.dumps({
    "virtual_mesh_mul_per_s": mesh_thr,
    "virtual_control_single_device_mul_per_s": control_thr,
    "efficiency_raw_vs_1dev": eff_raw,
    "efficiency_vs_same_total_batch_control": eff_ctl,
    "batch_per_device": B0,
}))
"""


def run_phase(code: str, env_extra=None) -> dict:
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3000,
    )
    sys.stderr.write(out.stderr[-4000:])
    if out.returncode != 0:
        raise RuntimeError(f"phase failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    rec = {}
    rec.update(run_phase(PHASE_CPU))
    try:
        rec.update(run_phase(PHASE_TPU))
    except Exception as e:  # TPU may be busy; CPU phases still land
        rec["tpu_phase_error"] = str(e)[:200]
    rec["analysis"] = (
        "Virtual-device 'weak scaling' on one host conflates core contention "
        "with communication: the controlled efficiency (sharded vs same "
        "total batch on one device) isolates sharding cost. The real-chip "
        "batch curve gives the per-device operating point a data-parallel "
        "mesh would run at; ct-ct mul+relin has no cross-shard collectives "
        "(keys/tables replicate), so multi-chip efficiency at batch>=the "
        "saturation knee is bounded by the controlled-virtual number, not "
        "the raw one."
    )
    with open(os.path.join(REPO, "WEAK_SCALING_r04.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
