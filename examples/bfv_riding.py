"""Oblivious ride hailing: encrypted squared distances between one rider and
many drivers (examples/bfv/examples_bfv.go).

Run: python examples/bfv_riding.py [log_n]
"""

import sys
import time

sys.path.insert(0, ".")

import os

import jax

# eager example pipelines belong on CPU; set LATTIGO_EXAMPLES_BACKEND to
# override (the axon TPU tunnel is jit-only territory)
if os.environ.get("LATTIGO_EXAMPLES_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lattigo_tpu.models import bfv


def main(log_n: int = 8):
    params = bfv.Parameters(
        log_n=log_n, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
    ).gen_from_log_moduli()
    n_drivers = params.n // 2

    kgen = bfv.KeyGenerator(params)
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk, 1)
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    dec = bfv.Decryptor(params, sk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(0)
    rider = rng.integers(0, 128, 2)
    drivers = rng.integers(0, 128, (n_drivers, 2))

    rider_slots = np.tile(rider, n_drivers).astype(np.uint64)
    driver_slots = drivers.reshape(-1).astype(np.uint64)

    t0 = time.time()
    ct_rider = encryptor.encrypt(enc.encode_uint(rider_slots))
    ct_drivers = encryptor.encrypt(enc.encode_uint(driver_slots))
    diff = ev.sub(ct_rider, ct_drivers)
    dist2 = ev.relinearize(ev.mul(diff, diff), rlk)
    out = enc.decode_uint(dec.decrypt(dist2))
    elapsed = time.time() - t0

    d2 = out[0::2] + out[1::2]
    want = ((drivers - rider) ** 2).sum(axis=1)
    ok = (d2 == want % params.t).all()
    closest = int(np.argmin(d2))
    print(
        f"{n_drivers} drivers, encrypted pipeline {elapsed:.1f}s; "
        f"closest driver = #{closest} at d^2 = {d2[closest]}; correct: {ok}"
    )
    return ok


if __name__ == "__main__":
    assert main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
