"""N-party private set intersection over threshold BFV
(examples/dbfv/psi/psi.go): CKG -> encrypt binary set vectors -> slot-wise
AND (multiplication chain) -> PCKS to an output key -> decrypt.

Run: python examples/dbfv_psi.py [n_parties] [log_n]
Defaults: 3 parties at the reference's PN13-class N=8192 (psi.go's
reference scale); backend is whatever jax selects (TPU when available) —
LATTIGO_EXAMPLES_BACKEND=cpu forces the CPU fallback, where the AND chain
runs eagerly (XLA's CPU backend compiles the fused keyswitch graph
pathologically slowly).
"""

import sys
import time

sys.path.insert(0, ".")

import os

import jax

if os.environ.get("LATTIGO_EXAMPLES_BACKEND", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lattigo_tpu import tjit
from lattigo_tpu.models import bfv, dbfv
from lattigo_tpu.utils.prng import CRPGenerator


def main(n_parties: int = 3, log_n: int = 13):
    if log_n >= 13:
        params = bfv.default_params(bfv.PN13QP218)
    else:
        params = bfv.Parameters(
            log_n=log_n, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
        ).gen_from_log_moduli()
    ctx = bfv.get_context(params)
    print(f"[setup]   N={params.n}, backend={jax.default_backend()}")

    def fold(proto, shares):
        acc = shares[0]
        for s in shares[1:]:
            acc = proto.aggregate(acc, s)
        return acc

    t0 = time.time()
    kgens = [bfv.KeyGenerator(params, rng_key=jax.random.key(i)) for i in range(n_parties)]
    sks = [kg.gen_secret_key() for kg in kgens]

    crp_gen = CRPGenerator(b"psi", ctx.ring_qp)
    crp_gen.seed(b"seed")
    ckg = dbfv.CKGProtocol(params)
    crp = crp_gen.clock_poly()
    pk = ckg.gen_public_key(fold(ckg, [ckg.gen_share(sk.sk, crp) for sk in sks]), crp)

    rkg = dbfv.RKGProtocolNaive(params)
    r1 = fold(rkg, [rkg.gen_share_round_one(sk.sk, pk) for sk in sks])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sk.sk, pk) for sk in sks])
    rlk = rkg.gen_relinearization_key(r2)
    print(f"[keygen]  {n_parties} parties, {time.time()-t0:.1f}s")

    # each party's set as a binary slot vector
    t0 = time.time()
    rng = np.random.default_rng(7)
    sets = [rng.integers(0, 2, params.n).astype(np.uint64) for _ in range(n_parties)]
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    cts = [encryptor.encrypt(enc.encode_uint(s)) for s in sets]

    # slot-wise AND = product of all binary vectors, one compiled program
    ev = bfv.Evaluator(params)

    def and_chain(first, rest, rk):
        acc = first
        for ct in rest:
            acc = ev.relinearize(ev.mul(acc, ct), rk)
        return acc

    if jax.default_backend() == "cpu":
        acc = and_chain(cts[0], cts[1:], rlk)
    else:
        acc = tjit.tjit(and_chain)(cts[0], cts[1:], rlk)
    jax.block_until_ready(acc.value[0][0])
    print(f"[AND]     {n_parties} sets intersected, {time.time()-t0:.1f}s")

    # PCKS to a fresh output key
    t0 = time.time()
    kg_out = bfv.KeyGenerator(params, rng_key=jax.random.key(999))
    sk_out, pk_out = kg_out.gen_key_pair()
    pcks = dbfv.PCKSProtocol(params)
    switched = pcks.key_switch(
        fold(pcks, [pcks.gen_share(sk.sk, pk_out, acc) for sk in sks]), acc
    )
    got = enc.decode_uint(bfv.Decryptor(params, sk_out).decrypt(switched))
    want = sets[0]
    for s in sets[1:]:
        want = want & s
    ok = (got == want).all()
    print(f"[PCKS+decrypt] {time.time()-t0:.1f}s; intersection of "
          f"{int(want.sum())} elements correct: {ok}")
    return ok


if __name__ == "__main__":
    n_parties = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    assert main(n_parties, log_n)
