"""Threshold protocols over device meshes.

Maps the dbfv/dckks protocol objects onto a ``party`` mesh axis: each device
computes its party's share locally and aggregation is the modular
all-gather-fold from :mod:`lattigo_tpu.parallel.mesh` — the TPU-native
replacement for the reference's in-process share passing (SURVEY.md section 5's
"Aggregate = all-reduce" mapping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lattigo_tpu.parallel.mesh import aggregate_mod


def collective_keygen_mesh(ckg, sk_shares, crp, mesh):
    """Run CKG with one party per mesh row: shares generated per-shard and
    psummed (modular fold) across the 'party' axis.  ``sk_shares``: stacked
    secret keys [P, L, N] pairs.  Returns the collective pk share (replicated).
    """
    ring = ckg.ctx.ring_qp
    n_party = mesh.shape["party"]

    # Per-party noise is sampled OUTSIDE the mapped function (explicit keys,
    # stacked) so each party's randomness is independent and reproducible.
    from lattigo_tpu.ops import samplers

    noises = []
    for p in range(n_party):
        e = ring.ntt(
            samplers.gaussian_poly(
                jax.random.fold_in(ckg._next_key(), p), ring, ckg.params.sigma
            )
        )
        noises.append(e)
    e_lo = jnp.stack([e[0] for e in noises])
    e_hi = jnp.stack([e[1] for e in noises])

    spec_party = P("party", None, None)
    rep = P(None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_party, spec_party, spec_party, spec_party, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    def run(sk_lo, sk_hi, e_lo, e_hi, crp_lo, crp_hi):
        sk = (sk_lo[0], sk_hi[0])
        e = (e_lo[0], e_hi[0])
        share = ring.mul_coeffs_montgomery_and_sub(sk, (crp_lo, crp_hi), e)
        agg = aggregate_mod(ring, share, "party")
        return agg

    sk_lo = jnp.stack([s[0] for s in sk_shares])
    sk_hi = jnp.stack([s[1] for s in sk_shares])
    with mesh:
        out = jax.jit(run)(sk_lo, sk_hi, e_lo, e_hi, crp[0], crp[1])
    return out
