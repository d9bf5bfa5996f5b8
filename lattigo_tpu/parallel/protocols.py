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


# ---------------------------------------------------------------------------
# Generic party-mesh protocol runner (round 2): every dbfv/dckks protocol's
# GenShare runs as one shard over the ``party`` axis; aggregation is the
# all-gather + modular fold from mesh.aggregate_mod, applied leaf-wise to the
# share pytree — the TPU-native form of the reference's Aggregate* adds
# (dbfv/keyswitching.go:115-118, dbfv/relinkey_gen.go:267-348).
# ---------------------------------------------------------------------------


def _party_spec(tree):
    return jax.tree.map(lambda _: P("party"), tree)


def _rep_spec(tree):
    return jax.tree.map(lambda _: P(), tree)


def _stack_parties(per_party):
    """List of per-party pytrees -> one pytree with leading party axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_party)


def mesh_aggregate(proto, share, axis: str = "party"):
    """Cross-device fold of a share pytree with the protocol's own
    ``aggregate`` (exact modular adds on the u32 planes)."""
    leaves, treedef = jax.tree_util.tree_flatten(share)
    gathered = [jax.lax.all_gather(leaf, axis) for leaf in leaves]
    n_party = gathered[0].shape[0]
    acc = treedef.unflatten([g[0] for g in gathered])
    for p in range(1, n_party):
        acc = proto.aggregate(acc, treedef.unflatten([g[p] for g in gathered]))
    return acc


def run_on_party_mesh(proto, mesh, gen_fn, party_args, rep_args):
    """Aggregate ``gen_fn``'s shares across the mesh ``party`` axis.

    ``gen_fn(*party_slices, *rep_args)`` is the protocol's GenShare, traced
    once per shard; ``party_args`` is a list of per-party pytree lists (e.g.
    secret keys), ``rep_args`` a list of replicated pytrees (crp, ciphertext
    polys, public keys).  Each shard runs with an independent fold of the
    protocol key, so per-party noise is independent and reproducible.
    Returns the aggregated share, replicated on every device.
    """
    n_party = mesh.shape["party"]
    keys = jax.random.split(proto._next_key(), n_party)
    kd = jax.random.key_data(keys)

    stacked = [_stack_parties(pa) for pa in party_args]
    in_specs = (
        P("party"),
        *[_party_spec(s) for s in stacked],
        *[_rep_spec(r) for r in rep_args],
    )

    def run(kd_s, *rest):
        party_slices = [
            jax.tree.map(lambda a: a[0], s) for s in rest[: len(stacked)]
        ]
        reps = rest[len(stacked):]
        key = jax.random.wrap_key_data(kd_s[0])
        with proto.using_key(key):
            share = gen_fn(*party_slices, *reps)
        return mesh_aggregate(proto, share)

    mapped = functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, check_vma=False
    )

    # out_specs must match the share structure, discovered abstractly
    out_tree = jax.eval_shape(
        lambda *a: gen_fn(
            *[jax.tree.map(lambda x: x[0], s) for s in a[: len(stacked)]],
            *a[len(stacked):],
        ),
        *stacked, *rep_args,
    )
    out_specs = jax.tree.map(lambda _: P(), out_tree)

    fn = mapped(run, out_specs=out_specs)
    with mesh:
        return jax.jit(fn)(kd, *stacked, *rep_args)


# -- per-protocol conveniences (dbfv and dckks alike) -----------------------


def cks_mesh(cks, mesh, sk_in_list, sk_out_list, ct):
    """Collective key switch on the party mesh -> switched ciphertext."""
    combined = run_on_party_mesh(
        cks, mesh,
        lambda sk_in, sk_out, *ct_polys: cks.gen_share(
            sk_in, sk_out, _rebuild_ct(ct, ct_polys)
        ),
        [sk_in_list, sk_out_list], list(ct.value),
    )
    return cks.key_switch(combined, ct)


def pcks_mesh(pcks, mesh, sk_list, pk, ct):
    combined = run_on_party_mesh(
        pcks, mesh,
        lambda sk, pk0, pk1, *ct_polys: pcks.gen_share(
            sk, _PK((pk0, pk1)), _rebuild_ct(ct, ct_polys)
        ),
        [sk_list], [pk.pk[0], pk.pk[1], *ct.value],
    )
    return pcks.key_switch(combined, ct)


def rtg_mesh(rtg, mesh, rot_type, k, sk_list, crp, rot_keys):
    combined = run_on_party_mesh(
        rtg, mesh,
        lambda sk, crp_: rtg.gen_share(rot_type, k, sk, crp_),
        [sk_list], [crp],
    )
    rtg.finalize(rot_type, k, combined, crp, rot_keys)
    return rot_keys


def refresh_mesh(refresh, mesh, sk_list, ct, crs):
    """dbfv collective refresh on the party mesh (dbfv/public_refresh.go);
    dckks refreshes go through refresh_mesh_dckks (their mask build is
    host-side big-int work that cannot be traced under shard_map)."""
    combined = run_on_party_mesh(
        refresh, mesh,
        lambda sk, crs_, *ct_polys: refresh.gen_share(
            sk, _rebuild_ct(ct, ct_polys), crs_
        ),
        [sk_list], [crs, *ct.value],
    )
    return refresh.finalize(ct, crs, combined)


def refresh_mesh_dckks(refresh, mesh, sk_list, ct, crs):
    """dckks collective refresh: per-party big-int masks are built on host
    (RefreshProtocol.gen_mask_planes, vectorized), then the traceable share
    math (gen_share_masked) runs as one party-mesh shard_map
    (dckks/public_refresh.go:44-151)."""
    n_party = mesh.shape["party"]
    masks = [refresh.gen_mask_planes(n_party, ct.level) for _ in range(n_party)]
    mask_lvl = [m[0] for m in masks]
    mask_full = [m[1] for m in masks]
    combined = run_on_party_mesh(
        refresh, mesh,
        lambda sk, m_lvl, m_full, crs_, c1: refresh.gen_share_masked(
            sk, c1, crs_, m_lvl, m_full
        ),
        [sk_list, mask_lvl, mask_full], [crs, ct.value[1]],
    )
    return refresh.finalize(ct, crs, combined)


def rkg_mesh(rkg, mesh, sk_list, crp):
    """3-round collective relinearization key: each round is one party-mesh
    shard_map with an aggregation barrier between rounds
    (dbfv/relinkey_gen.go:212-348)."""
    n_party = mesh.shape["party"]
    u_eph = [rkg.new_ephemeral_key() for _ in range(n_party)]
    r1 = run_on_party_mesh(
        rkg, mesh,
        lambda u_e, sk, crp_: rkg.gen_share_round_one(u_e, sk, crp_),
        [u_eph, sk_list], [crp],
    )
    r2 = run_on_party_mesh(
        rkg, mesh,
        lambda sk, r1_, crp_: rkg.gen_share_round_two(r1_, sk, crp_),
        [sk_list], [r1, crp],
    )
    r3 = run_on_party_mesh(
        rkg, mesh,
        lambda u_e, sk, r2_: rkg.gen_share_round_three(r2_, u_e, sk),
        [u_eph, sk_list], [r2],
    )
    return rkg.gen_relinearization_key(r2, r3)


def ckg_mesh(ckg, mesh, sk_list, crp):
    combined = run_on_party_mesh(
        ckg, mesh,
        lambda sk, crp_: ckg.gen_share(sk, crp_),
        [sk_list], [crp],
    )
    return ckg.gen_public_key(combined, crp)


def _rebuild_ct(template, polys):
    """Re-wrap raw poly pairs in the scheme's ciphertext type, preserving
    static metadata (scale/is_ntt for ckks)."""
    out = template.copy()
    out.value = list(polys)
    return out


class _PK:
    def __init__(self, pk):
        self.pk = pk
