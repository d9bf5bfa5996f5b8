"""N-party private information retrieval over threshold BFV
(examples/dbfv/pir/pir.go).

Pipeline: CKG -> RKG (3 rounds) -> RTG (pow2 rotations) -> encrypt the
database rows and a one-hot query under the collective key -> cloud computes
sum_r (query*mask_r) x row_r with InnerSum -> Relinearize -> CKS to the
requester's key -> decrypt.

TPU-first cloud phase: where the reference fans the per-row work out to
goroutines (pir.go:293-331), here the rows ride a leading batch axis of ONE
compiled program (tjit, tables and keys as device arguments) and the final
sum is a log-depth tree of modular adds.  With more than one device
visible, the row axis shards over a ``data`` mesh and XLA partitions the
same program (collectives only in the final fold).

Run: python examples/dbfv_pir.py [n_parties] [log_n]
Defaults: 3 parties at the reference's PN13-class N=8192 (pir.go:32 uses
log_n=13); backend is whatever jax selects (TPU when available) —
LATTIGO_EXAMPLES_BACKEND=cpu forces the CPU fallback.
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


def _params(log_n: int):
    if log_n >= 13:
        return bfv.default_params(bfv.PN13QP218)
    return bfv.Parameters(
        log_n=log_n,
        t=65537,
        log_qi=(46, 46),
        log_pi=(47,),
        log_qi_mul=(60, 60),
    ).gen_from_log_moduli()


def main(n_parties: int = 3, log_n: int = 13, n_rows: int = 8):
    params = _params(log_n)
    ctx = bfv.get_context(params)
    print(f"[setup]   N={params.n}, t={params.t}, backend={jax.default_backend()}")

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
    import jax.numpy as jnp

    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    rng = np.random.default_rng(0)
    rows = [rng.integers(0, 256, params.n, dtype=np.uint64) for _ in range(n_rows)]
    wanted = 2
    query = np.zeros(params.n, dtype=np.uint64)
    query[wanted] = 1
    ct_rows = [encryptor.encrypt(enc.encode_uint(r)) for r in rows]
    ct_query = encryptor.encrypt(enc.encode_uint(query))

    # stacked cloud inputs: [R, ...] leading row axis
    stack = lambda ps: (
        jnp.stack([p[0] for p in ps]),
        jnp.stack([p[1] for p in ps]),
    )
    rows_c0 = stack([ct.value[0] for ct in ct_rows])
    rows_c1 = stack([ct.value[1] for ct in ct_rows])
    masks = []
    for r in range(n_rows):
        mask = np.zeros(params.n, dtype=np.uint64)
        mask[r] = 1
        masks.append(enc.encode_uint(mask).value)
    masks_s = stack(masks)
    print(f"[encrypt] {n_rows} rows, {time.time()-t0:.1f}s")

    # --- cloud: one batched program over the row axis ---
    t0 = time.time()
    ev = bfv.Evaluator(params)
    n_dev = jax.device_count()
    if n_dev > 1 and n_rows % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lattigo_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev, party=1)
        shard = NamedSharding(mesh, P("data"))
        put = lambda t: (jax.device_put(t[0], shard), jax.device_put(t[1], shard))
        rows_c0, rows_c1, masks_s = put(rows_c0), put(rows_c1), put(masks_s)
        print(f"[cloud]   row axis sharded over {n_dev} devices")

    def cloud(q_ct, r0, r1, m, rk, rot):
        R = r0[0].shape[0]
        bq0 = (jnp.broadcast_to(q_ct.value[0][0][None], r0[0].shape),
               jnp.broadcast_to(q_ct.value[0][1][None], r0[1].shape))
        bq1 = (jnp.broadcast_to(q_ct.value[1][0][None], r0[0].shape),
               jnp.broadcast_to(q_ct.value[1][1][None], r0[1].shape))
        sel = ev.mul(bfv.Ciphertext([bq0, bq1]), bfv.Plaintext(m))
        sel = ev.inner_sum(sel, rot)
        part = ev.mul(sel, bfv.Ciphertext([r0, r1]))  # degree-2 batch [R,...]
        # log-depth modular tree fold over the row axis
        vals = part.value
        while R > 1:
            half = R // 2
            vals = [
                ctx.ring_q.add(
                    (v[0][:half], v[1][:half]), (v[0][half:], v[1][half:])
                )
                for v in vals
            ]
            R = half
        acc = bfv.Ciphertext([(v[0][0], v[1][0]) for v in vals])
        return ev.relinearize(acc, rk)

    if jax.default_backend() == "cpu":
        # XLA's CPU backend compiles the fused batched keyswitch graph
        # pathologically slowly; run the same batched math eagerly there
        result = cloud(ct_query, rows_c0, rows_c1, masks_s, rlk, rot_keys)
        jax.block_until_ready(result.value[0][0])
        print(f"[cloud]   select+innersum+mul+relin (batched, eager cpu): "
              f"{time.time()-t0:.1f}s")
    else:
        cloud_j = tjit.tjit(cloud)
        result = cloud_j(ct_query, rows_c0, rows_c1, masks_s, rlk, rot_keys)
        jax.block_until_ready(result.value[0][0])
        compile_s = time.time() - t0
        t0 = time.time()
        result = cloud_j(ct_query, rows_c0, rows_c1, masks_s, rlk, rot_keys)
        jax.block_until_ready(result.value[0][0])
        print(f"[cloud]   select+innersum+mul+relin (batched): compile+first "
              f"{compile_s:.1f}s, steady {time.time()-t0:.2f}s")

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
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    assert main(n_parties, log_n)
