"""N-party private information retrieval over threshold BFV
(examples/dbfv/pir/pir.go).

Pipeline: CKG -> RKG (3 rounds) -> RTG (pow2 rotations) -> encrypt the
database rows and a one-hot query under the collective key -> cloud computes
sum_r (query*mask_r) x row_r with InnerSum -> Relinearize -> CKS to the
requester's key -> decrypt.

Run: python examples/dbfv_pir.py [n_parties] [log_n]
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

from lattigo_tpu.models import bfv, dbfv
from lattigo_tpu.utils.prng import CRPGenerator


def main(n_parties: int = 3, log_n: int = 8):
    params = bfv.Parameters(
        log_n=log_n,
        t=65537,
        log_qi=(46, 46),
        log_pi=(47,),
        log_qi_mul=(60, 60),
    ).gen_from_log_moduli()
    ctx = bfv.get_context(params)
    n_rows = 4

    t0 = time.time()
    kgens = [
        bfv.KeyGenerator(params, rng_key=jax.random.key(i)) for i in range(n_parties)
    ]
    sks = [kg.gen_secret_key() for kg in kgens]
    ring = ctx.ring_qp
    sk_col = sks[0].sk
    for s in sks[1:]:
        sk_col = ring.add(sk_col, s.sk)
    sk_col = bfv.SecretKey(sk_col)

    crp_gen = CRPGenerator(b"pir", ctx.ring_qp)
    crp_gen.seed(b"common-seed")

    def stacked_crp(beta):
        import jax.numpy as jnp

        polys = [crp_gen.clock_poly() for _ in range(beta)]
        return (
            jnp.stack([p[0] for p in polys]),
            jnp.stack([p[1] for p in polys]),
        )

    def fold(proto, shares):
        acc = shares[0]
        for s in shares[1:]:
            acc = proto.aggregate(acc, s)
        return acc

    # --- collective keygen ---
    ckg = dbfv.CKGProtocol(params)
    crp = crp_gen.clock_poly()
    pk = ckg.gen_public_key(
        fold(ckg, [ckg.gen_share(sk.sk, crp) for sk in sks]), crp
    )

    rkg = dbfv.RKGProtocol(params)
    crp_rkg = stacked_crp(params.beta)
    ephs = [rkg.new_ephemeral_key() for _ in range(n_parties)]
    r1 = fold(rkg, [rkg.gen_share_round_one(ephs[i], sks[i].sk, crp_rkg) for i in range(n_parties)])
    r2 = fold(rkg, [rkg.gen_share_round_two(r1, sks[i].sk, crp_rkg) for i in range(n_parties)])
    r3 = fold(rkg, [rkg.gen_share_round_three(r2, ephs[i], sks[i].sk) for i in range(n_parties)])
    rlk = rkg.gen_relinearization_key(r2, r3)

    rtg = dbfv.RTGProtocol(params)
    rot_keys = bfv.RotationKeys()
    i = 1
    while i < params.n >> 1:
        crp_rot = stacked_crp(params.beta)
        shares = [rtg.gen_share("left", i, sk.sk, crp_rot) for sk in sks]
        rtg.finalize("left", i, fold(rtg, shares), crp_rot, rot_keys)
        i <<= 1
    crp_row = stacked_crp(params.beta)
    shares = [rtg.gen_share("row", 0, sk.sk, crp_row) for sk in sks]
    rtg.finalize("row", 0, fold(rtg, shares), crp_row, rot_keys)
    print(f"[keygen]  {n_parties} parties, {time.time()-t0:.1f}s")

    # --- encrypt database + query ---
    t0 = time.time()
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    rng = np.random.default_rng(0)
    rows = [rng.integers(0, 256, params.n, dtype=np.uint64) for _ in range(n_rows)]
    wanted = 2
    query = np.zeros(params.n, dtype=np.uint64)
    query[wanted] = 1
    ct_rows = [encryptor.encrypt(enc.encode_uint(r)) for r in rows]
    ct_query = encryptor.encrypt(enc.encode_uint(query))
    print(f"[encrypt] {n_rows} rows, {time.time()-t0:.1f}s")

    # --- cloud: select the requested row obliviously ---
    t0 = time.time()
    ev = bfv.Evaluator(params)
    acc = None
    for r, ct_row in enumerate(ct_rows):
        mask = np.zeros(params.n, dtype=np.uint64)
        mask[r] = 1
        sel = ev.mul(ct_query, enc.encode_uint(mask))   # query x mask_r
        sel = ev.inner_sum(sel, rot_keys)               # broadcast the bit
        part = ev.mul(sel, ct_row)                      # x row_r
        acc = part if acc is None else ev.add(acc, part)
    result = ev.relinearize(acc, rlk)
    print(f"[cloud]   select+innersum+mul, {time.time()-t0:.1f}s")

    # --- CKS to the requester's own key, then decrypt ---
    t0 = time.time()
    kg_req = bfv.KeyGenerator(params, rng_key=jax.random.key(10_000))
    sk_req = kg_req.gen_secret_key()
    cks = dbfv.CKSProtocol(params)
    # collective switch from sum(sk_i) to sk_req: party 0 targets sk_req,
    # every other party targets 0 (pir.go:355-370's handover)
    zero = (jax.numpy.zeros_like(sks[0].sk[0]), jax.numpy.zeros_like(sks[0].sk[1]))
    shares = [cks.gen_share(sks[i].sk, zero if i else sk_req.sk, result) for i in range(n_parties)]
    switched = cks.key_switch(fold(cks, shares), result)
    dec = bfv.Decryptor(params, sk_req)
    got = enc.decode_uint(dec.decrypt(switched))
    ok = (got == rows[wanted]).all()
    print(f"[switch+decrypt] {time.time()-t0:.1f}s -> row {wanted} retrieved: {ok}")
    return ok


if __name__ == "__main__":
    n_parties = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    assert main(n_parties, log_n)
