"""Encrypted sigmoid via Chebyshev approximation over CKKS
(examples/ckks/examples_ckks.go).

Run: python examples/ckks_sigmoid.py [log_n]
"""

import math
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

from lattigo_tpu.models import ckks


def main(log_n: int = 8):
    params = ckks.Parameters(
        log_n=log_n,
        log_slots=log_n - 1,
        scale=float(1 << 30),
        log_qi=(45, 30, 30, 30, 30, 30),
        log_pi=(45,),
    ).gen_from_log_moduli()

    kgen = ckks.KeyGenerator(params)
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, pk=pk)
    dec = ckks.Decryptor(params, sk)
    ev = ckks.Evaluator(params)

    rng = np.random.default_rng(1)
    values = rng.uniform(-4, 4, params.slots).astype(np.complex128)

    t0 = time.time()
    ct = encryptor.encrypt(enc.encode(values))
    cheby = ckks.approximate(lambda x: 1 / (math.exp(-x.real) + 1), -4, 4, 7)
    out = ckks.evaluate_cheby_eco(ev, ct, cheby, rlk)
    got = enc.decode(dec.decrypt(out)).real
    elapsed = time.time() - t0

    want = 1 / (np.exp(-values.real) + 1)
    err = np.maximum(np.abs(got - want), 1e-16)
    bits = float(np.median(np.log2(1 / err)))
    levels = params.max_level - out.level
    print(
        f"{params.slots} slots, degree-7 Chebyshev sigmoid in {elapsed:.1f}s; "
        f"{levels} levels consumed; median precision {bits:.1f} bits"
    )
    return bits > 7


if __name__ == "__main__":
    assert main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
