"""Record the weak-scaling efficiency curve (virtual 8-CPU mesh) into
WEAK_SCALING_r02.json — the stand-in for the 32-chip ICI metric until real
multi-chip hardware is available (BASELINE.md target: >=80% at 32 chips)."""
import json
import jax
jax.config.update("jax_platforms", "cpu")

from lattigo_tpu.models import ckks
from lattigo_tpu.parallel.scaling import weak_scaling_mul

params = ckks.Parameters(
    log_n=10, log_slots=9, scale=float(1 << 30), log_qi=(35, 30, 30), log_pi=(36,)
).gen_from_log_moduli()

curve = {}
for n in (1, 2, 4, 8):
    r = weak_scaling_mul(params, n, batch_per_device=2, iters=6)
    curve.update({str(k): v for k, v in r.items()})
base = curve["1"]
out = {
    "metric": "ckks_ctct_mul_weak_scaling",
    "backend": "cpu-virtual-8dev (single host; ICI numbers need real multi-chip)",
    "params": "logN=11, 3xQ/1xP",
    "throughput_ct_mults_per_s": {k: round(v, 2) for k, v in curve.items()},
    "efficiency": {k: round(v / (int(k) * base), 4) for k, v in curve.items()},
}
with open("WEAK_SCALING_r02.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
