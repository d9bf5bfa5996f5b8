"""Cross-chip four-step NTT: one transform sharded over the mesh.

A single negacyclic NTT of dimension N = n1 x n2 runs as (SURVEY.md section 5's
"long-context" analog; Bailey four-step over the reference's DIT schedule,
twiddle order per ring/ring_context.go:166-204 so outputs stay bit-exact):

  1. view coefficients as an (n1, n2) matrix, sharded on the n2 (column)
     axis — every butterfly stage with stride >= n2 couples rows only, so
     the first log2(n1) stages are device-local;
  2. all_to_all transpose of the shard axis (columns -> rows), riding ICI;
  3. the remaining log2(n2) stages couple within rows (now fully local),
     with the stage twiddle planes sharded on the row axis.

The butterflies are the same lazy-Montgomery kernels as Ring._ntt_simple
(ring/ntt.go:53-139), so the sharded transform equals the single-device
transform bit for bit (tests/test_cross_ntt.py).  The inverse runs the
mirror schedule: local row stages, all_to_all back, local column stages.

Scheme-level path (VERDICT r4 item 4): ``sharded_ntt(mesh, axis)`` is a
context manager that reroutes EVERY ``Ring.ntt_limbs``/``intt_limbs`` call
through this transform (arbitrary batch shapes and limb subsets), so
evaluators/encryptors reach the cross-chip NTT with no per-op plumbing —
the TPU analog of the reference's one NTT serving all callers
(ring/ntt.go:53-86).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from lattigo_tpu.ops import modred
from lattigo_tpu.ops import u64 as u

U64 = u.U64

# active (mesh, axis, min_n) installed by sharded_ntt(); consulted by the
# Ring dispatcher (ops/ring.py) on every transform
_ACTIVE: tuple | None = None


@contextlib.contextmanager
def sharded_ntt(mesh, axis: str = "data", min_n: int = 1 << 14):
    """Route every Ring NTT/InvNTT with n >= min_n through the cross-chip
    four-step transform on ``mesh``'s ``axis`` for the duration."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (mesh, axis, min_n)
    try:
        yield
    finally:
        _ACTIVE = prev


def active_for(n: int):
    """(mesh, axis) when a sharded-NTT context covers ring dimension n."""
    if _ACTIVE is not None and n >= _ACTIVE[2]:
        return _ACTIVE[0], _ACTIVE[1]
    return None


def _phase_tables(ring, limbs, n1, n2, inverse):
    """Per-stage V-half twiddle planes.

    Phase A (strides >= n2, row-coupling): [S_a][L, n1/2] — value per V row.
    Phase B (strides < n2, in-row):        [S_b][L, n1, n2/2] — value per
    (row, V column), the part that must be sharded with the rows.
    """
    n = ring.n
    host = ring.ntt_psi_inv_host if inverse else ring.ntt_psi_host
    host = host[np.array(limbs)]
    a_stages, b_stages = [], []
    t = n // 2
    while t >= 1:
        (a_stages if t >= n2 else b_stages).append(t)
        t //= 2
    if inverse:
        a_stages, b_stages = a_stages[::-1], b_stages[::-1]

    A = []
    for t in a_stages:
        m = n // (2 * t)
        rows_per_group = t // n2  # V rows per group half
        # V row r (0..n1/2): group = r // rows_per_group
        idx = m + np.arange(n1 // 2) // rows_per_group
        A.append(host[:, idx])  # [L, n1/2]
    B = []
    for t in b_stages:
        m = n // (2 * t)
        r = np.arange(n1)[:, None]
        cg = np.arange(n2 // 2) // t  # V-column group
        idx = m + r * (n2 // (2 * t)) + cg[None, :]
        B.append(host[:, idx])  # [L, n1, n2/2]
    return a_stages, A, b_stages, B


def _butterfly_fwd(uu, vv, f, q, two_q, qinv):
    uu = u.select64(u.lt64(two_q, uu), u.sub64(uu, two_q), uu)
    vv = modred.mred_constant(vv, f, q, qinv)
    return u.add64(uu, vv), u.sub64(u.add64(uu, two_q), vv)


def _butterfly_inv(uu, vv, f, q, two_q, qinv):
    x = u.add64(uu, vv)
    x = u.select64(u.lt64(two_q, x), u.sub64(x, two_q), x)
    y = modred.mred_constant(u.sub64(u.add64(uu, two_q), vv), f, q, qinv)
    return x, y


def ntt_four_step(ring, x: U64, mesh, axis: str = "data",
                  n2: int | None = None, inverse: bool = False,
                  limbs: tuple[int, ...] | None = None) -> U64:
    """Sharded negacyclic (Inv)NTT of x [..., L, N] over the carried limbs
    (default: the prefix 0..level); bit-exact vs ring.ntt/intt."""
    n = ring.n
    D = mesh.shape[axis]
    n2 = n2 or max(128, D)
    n1 = n // n2
    assert n1 % D == 0 and n2 % D == 0, "n1 and n2 must split over the axis"
    if limbs is None:
        limbs = tuple(range(ring.level_of(x) + 1))
    L = len(limbs)
    batch = x[0].shape[:-2]
    Bf = int(np.prod(batch, dtype=np.int64)) if batch else 1

    run, b_lo, b_hi = _build_four_step(ring, tuple(limbs), mesh, axis, n2,
                                       inverse, Bf)
    lo = x[0].reshape(Bf, L, n1, n2)
    hi = x[1].reshape(Bf, L, n1, n2)
    with mesh:
        out_lo, out_hi = run(lo, hi, b_lo, b_hi)
    return out_lo.reshape(*batch, L, n), out_hi.reshape(*batch, L, n)


@functools.lru_cache(maxsize=None)
def _build_four_step(ring, limbs, mesh, axis, n2, inverse, Bf):
    """Jitted sharded transform + stacked phase-B twiddle operands, cached
    per (ring, limbs, mesh, axis, n2, direction, batch) so repeated calls
    reuse one trace/compile (and one twiddle-table build)."""
    n = ring.n
    n1 = n // n2
    L = len(limbs)

    a_st, A, b_st, B = _phase_tables(ring, limbs, n1, n2, inverse)
    A_dev = [u.from_u64(a) for a in A]
    B_dev = [u.from_u64(b) for b in B]

    qs = ring._tbl_rows(ring.q_, limbs)
    two_qs = ring._tbl_rows(ring.two_q_, limbs)
    qinvs = ring._tbl_rows(ring.qinv_, limbs)
    u0s = ring._tbl_rows(ring.u0_, limbs)
    ninvs = ring._tbl_rows(ring.n_inv_, limbs)

    def phase_a(lo, hi):
        # lo/hi: [Bf, L, n1, n2_loc]; strides t >= n2 couple rows
        c5 = lambda t: (t[0][None, :, :, None, None], t[1][None, :, :, None, None])
        q5, tq5, qi5 = c5(qs), c5(two_qs), c5(qinvs)  # [1, L, 1, 1, 1]
        bf = _butterfly_inv if inverse else _butterfly_fwd
        for t, f_host in zip(a_st, A_dev):
            g = n1 // 2 // (t // n2)  # groups
            shp = (Bf, L, g, 2, t // n2, lo.shape[-1])
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            uu = (lo_r[:, :, :, 0], hi_r[:, :, :, 0])  # [Bf, L, g, t/n2, C]
            vv = (lo_r[:, :, :, 1], hi_r[:, :, :, 1])
            f = (
                f_host[0].reshape(1, L, g, t // n2)[..., None],
                f_host[1].reshape(1, L, g, t // n2)[..., None],
            )
            xn, yn = bf(uu, vv, f, q5, tq5, qi5)
            lo = jnp.stack([xn[0], yn[0]], axis=3).reshape(Bf, L, n1, -1)
            hi = jnp.stack([xn[1], yn[1]], axis=3).reshape(Bf, L, n1, -1)
        return lo, hi

    def phase_b(lo, hi, b_tw):
        # lo/hi: [Bf, L, n1_loc, n2]; strides t < n2 couple columns
        bf = _butterfly_inv if inverse else _butterfly_fwd
        n1_loc = lo.shape[2]
        c5 = lambda t: (t[0][None, :, :, None, None], t[1][None, :, :, None, None])
        q, two_q, qinv = c5(qs), c5(two_qs), c5(qinvs)  # [1, L, 1, 1, 1]
        for (t, f_lo, f_hi) in b_tw:
            g = n2 // (2 * t)
            shp = (Bf, L, n1_loc, g, 2, t)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            uu = (lo_r[:, :, :, :, 0], hi_r[:, :, :, :, 0])
            vv = (lo_r[:, :, :, :, 1], hi_r[:, :, :, :, 1])
            f = (
                f_lo.reshape(1, L, n1_loc, g, t),
                f_hi.reshape(1, L, n1_loc, g, t),
            )
            xn, yn = bf(uu, vv, f, q, two_q, qinv)
            lo = jnp.stack([xn[0], yn[0]], axis=4).reshape(Bf, L, n1_loc, n2)
            hi = jnp.stack([xn[1], yn[1]], axis=4).reshape(Bf, L, n1_loc, n2)
        return lo, hi

    spec_col = P(None, None, None, axis)
    spec_row = P(None, None, axis, None)

    # stacked B twiddles [S, L, n1, n2/2], sharded on the row axis (dim 2)
    if B_dev:
        b_lo = jnp.stack([b[0] for b in B_dev])  # [S, L, n1, n2/2]
        b_hi = jnp.stack([b[1] for b in B_dev])
    else:
        b_lo = jnp.zeros((0, L, n1, n2 // 2), jnp.uint32)
        b_hi = jnp.zeros((0, L, n1, n2 // 2), jnp.uint32)
    spec_btw = P(None, None, axis, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_col, spec_col, spec_btw, spec_btw),
        out_specs=(spec_row, spec_row),
        check_vma=False,
    )
    def fwd(lo, hi, btw_lo, btw_hi):
        lo, hi = phase_a(lo, hi)
        # transpose the shard axis: columns -> rows
        lo = jax.lax.all_to_all(lo, axis, split_axis=2, concat_axis=3, tiled=True)
        hi = jax.lax.all_to_all(hi, axis, split_axis=2, concat_axis=3, tiled=True)
        b_tw = [(t, btw_lo[i], btw_hi[i]) for i, t in enumerate(b_st)]
        lo, hi = phase_b(lo, hi, b_tw)
        # final exact reduction
        q2 = (qs[0][None, :, None, :], qs[1][None, :, None, :])
        u02 = (u0s[0][None, :, None, :], u0s[1][None, :, None, :])
        r = modred.bred_add((lo, hi), q2, u02)
        return r

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_row, spec_row, spec_btw, spec_btw),
        out_specs=(spec_col, spec_col),
        check_vma=False,
    )
    def inv(lo, hi, btw_lo, btw_hi):
        b_tw = [(t, btw_lo[i], btw_hi[i]) for i, t in enumerate(b_st)]
        lo, hi = phase_b(lo, hi, b_tw)
        lo = jax.lax.all_to_all(lo, axis, split_axis=3, concat_axis=2, tiled=True)
        hi = jax.lax.all_to_all(hi, axis, split_axis=3, concat_axis=2, tiled=True)
        lo, hi = phase_a(lo, hi)
        q2 = (qs[0][None, :, None, :], qs[1][None, :, None, :])
        qi2 = (qinvs[0][None, :, None, :], qinvs[1][None, :, None, :])
        ni2 = (ninvs[0][None, :, None, :], ninvs[1][None, :, None, :])
        return modred.mred((lo, hi), ni2, q2, qi2)

    return jax.jit(inv if inverse else fwd), b_lo, b_hi
