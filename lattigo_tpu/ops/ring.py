"""RNS polynomial ring context and coefficient-wise operations.

TPU-native counterpart of the reference's ``ring.Context`` + ``ring/ring.go``
coefficient kernels and ``ring/ntt.go`` transforms.  Design differences from
the Go reference (which loops scalar uint64 ops per coefficient):

* A polynomial is a pair of ``uint32`` planes of shape ``[..., L, N]``
  (two-plane uint64, see :mod:`lattigo_tpu.ops.u64`), where ``L`` is the
  number of RNS limbs *actually carried* — level ``l`` objects carry ``l+1``
  limbs, mirroring the reference's shrinking ``Coeffs[:level+1]`` slices while
  keeping every jit trace static.
* All per-modulus constants are precomputed host-side with Python ints
  (matching ring/ring_context.go:68-209 bit for bit) and materialized as
  ``[L, 1]``-shaped device constants that broadcast over coefficients.
* The NTT runs as log2(N) vectorized butterfly stages over ``[L, m, 2, t]``
  views — each stage is one fused elementwise pass over the whole limb stack,
  instead of the reference's per-modulus scalar loop nest.  Twiddles are the
  reference's bit-reversed Montgomery psi tables (ring/ring_context.go:160-209),
  so outputs are bit-exact vs ``ring/test_data`` golden vectors.

Leading batch dimensions broadcast: every op accepts ``[..., L, N]``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from lattigo_tpu.ops import modred, number_theory as nt
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.tjit import content_key, table

U64 = u.U64

# Test hooks: route the TPU Pallas schedules through the dispatcher on any
# backend (interpret mode off-TPU) so CI exercises the production paths.
FORCE_PALLAS = False
FORCE_TILE = False
FORCE_MXU = False

# Batch (polys) at or above which the MXU four-step kernel beats the tile
# butterfly kernel (measured, perf_lab/lab18: parity at B=2, 18 vs ~27
# us/limb at B=4, 2x at B>=16 — and the evaluators now stack poly/beta
# axes into the batch, so small-batch dispatch decides scheme-op cost).
_MXU_MIN_BATCH = 2


def _tbl(vals, shape=None) -> U64:
    """Host ints -> device U64 constant pair."""
    arr = np.array(vals, dtype=np.uint64)
    if shape is not None:
        arr = arr.reshape(shape)
    return u.from_u64(arr)


class Ring:
    """Precomputed modular/NTT context for R_Q = Z_Q[X]/(X^N + 1).

    Mirrors ring/ring_context.go:18-51.  ``moduli`` must be distinct primes
    == 1 mod 2N for the NTT to be enabled.
    """

    def __init__(self, n: int, moduli: list[int], compute_ntt_tables: bool = True):
        if n & (n - 1) != 0:
            raise ValueError("ring degree must be a power of 2")
        self.n = n
        self.log_n = n.bit_length() - 1
        self.moduli = [int(q) for q in moduli]
        self.L = len(self.moduli)
        # content-based identity: rings with equal (n, moduli) share every
        # tjit-registered table (see lattigo_tpu.tjit)
        self.key = content_key("ring", n, tuple(self.moduli))
        self.modulus_bigint = 1
        for q in self.moduli:
            self.modulus_bigint *= q

        # Host-side integer tables.
        self.bred = [nt.bred_params(q) for q in self.moduli]
        self.qinv = [
            nt.mred_params(q) if q & (q - 1) != 0 else 0 for q in self.moduli
        ]
        self.mask = [(1 << q.bit_length()) - 1 for q in self.moduli]

        # Device constants, shaped [L, 1] to broadcast over N.
        Lx1 = (self.L, 1)
        self.q_ = _tbl(self.moduli, Lx1)
        self.two_q_ = _tbl([2 * q for q in self.moduli], Lx1)
        self.u0_ = _tbl([b[0] for b in self.bred], Lx1)
        self.u1_ = _tbl([b[1] for b in self.bred], Lx1)
        self.qinv_ = _tbl(self.qinv, Lx1)

        self.allows_ntt = False
        if compute_ntt_tables:
            self._gen_ntt_tables()

    # -- precomputation ----------------------------------------------------

    def _gen_ntt_tables(self):
        """ring/ring_context.go:129-209 (GenNTTParams)."""
        n = self.n
        for q in self.moduli:
            if not nt.is_prime(q) or q & (2 * n - 1) != 1:
                raise ValueError(f"modulus {q} does not allow NTT (need prime == 1 mod 2N)")

        # rescaleParams[j-1][i] = MForm((q_j)^-1 mod q_i) for i < j.
        self.rescale_params = [
            [
                nt.mform(pow(self.moduli[j], -1, self.moduli[i]), self.moduli[i])
                for i in range(j)
            ]
            for j in range(1, self.L)
        ]

        psi_rows, psi_inv_rows, n_inv, psis, psi_invs = [], [], [], [], []
        for q in self.moduli:
            p, pi, ninv, psi_m, psi_im = nt.psi_tables(q, n)
            psi_rows.append(p)
            psi_inv_rows.append(pi)
            n_inv.append(ninv)
            psis.append(psi_m)
            psi_invs.append(psi_im)
        self.psi_mont = psis
        self.psi_inv_mont = psi_invs
        self.ntt_psi_host = np.array(psi_rows, dtype=np.uint64)       # [L, N]
        self.ntt_psi_inv_host = np.array(psi_inv_rows, dtype=np.uint64)

        self._shoup_cache: dict = {}
        self.psi_ = u.from_u64(self.ntt_psi_host)
        self.psi_inv_ = u.from_u64(self.ntt_psi_inv_host)
        self.n_inv_ = _tbl(n_inv, (self.L, 1))
        self._tw_cache: dict = {}
        self.allows_ntt = True

    # -- helpers -----------------------------------------------------------

    def level_of(self, x: U64) -> int:
        return x[0].shape[-2] - 1

    def _c(self, table: U64, lvl: int) -> U64:
        """Slice a [L, ...] device constant down to lvl+1 limbs."""
        return table[0][: lvl + 1], table[1][: lvl + 1]

    def new_poly(self, lvl: int | None = None, batch=()) -> U64:
        L = self.L if lvl is None else lvl + 1
        return u.zeros64((*batch, L, self.n))

    # -- NTT ---------------------------------------------------------------

    def _tbl_rows(self, table: U64, limbs: tuple[int, ...]) -> U64:
        if limbs == tuple(range(len(limbs))):  # prefix: cheap static slice
            return table[0][: len(limbs)], table[1][: len(limbs)]
        idx = np.array(limbs, dtype=np.int32)
        return table[0][idx], table[1][idx]

    def _psi_pair(self, inverse: bool) -> U64:
        """Managed [L, N] merged-psi table (Montgomery form) — a tjit table
        so compiled pipelines receive it as a device argument, not an
        embedded HLO constant."""
        host = self.ntt_psi_inv_host if inverse else self.ntt_psi_host
        return table(f"{self.key}/psi{int(inverse)}", lambda: u.from_u64(host))

    def ntt(self, x: U64) -> U64:
        """Forward negacyclic NTT over every carried limb (ring/ntt.go:53-86).

        Output fully reduced in [0, q) — bit-exact vs the reference.
        """
        return self.ntt_limbs(x, tuple(range(self.level_of(x) + 1)))

    # The transform below has two implementations with identical (bit-exact)
    # outputs:
    #  * _ntt_simple: one reshape per stage, trailing dim shrinks to 1 — fine
    #    on CPU/small N, catastrophic for TPU tiling at large N.
    #  * _ntt_fast: stages with butterfly stride >= 128 run on an [R, 128]
    #    view (full-lane tiles); the remaining stages run on the transposed
    #    [128, R] view with host-precomputed per-stage twiddle planes, so no
    #    stage ever materializes a tiny trailing dimension.  This is the
    #    TPU-shaped formulation of the same Cooley-Tukey schedule (a
    #    transpose-split akin to the four-step NTT).
    _NTT_FAST_MIN = 4096
    _LANE = 128

    @staticmethod
    def _on_tpu() -> bool:
        import jax

        try:
            return jax.default_backend() not in ("cpu",)
        except Exception:
            return False

    def ntt_limbs(self, x: U64, limbs: tuple[int, ...]) -> U64:
        """Forward NTT of x[..., k, :] under modulus ``limbs[k]`` — used when
        the carried limbs are not the prefix 0..L-1 (rescale correction,
        key-switch decomposition).  Inputs may be lazily reduced (< 4q)."""
        from lattigo_tpu.parallel import cross_ntt

        act = cross_ntt.active_for(self.n)
        if act is not None:
            # scheme-level cross-chip path: a sharded_ntt(mesh, axis)
            # context routes every transform through the four-step
            # all-to-all kernel (parallel/cross_ntt.py), serving all
            # callers like the reference's single NTT (ring/ntt.go:53-86)
            return cross_ntt.ntt_four_step(
                self, x, act[0], axis=act[1], limbs=limbs, inverse=False)
        if self.n >= self._NTT_FAST_MIN:
            on_tpu = self._on_tpu()
            if FORCE_PALLAS:
                from lattigo_tpu.ops import pallas_ntt

                return pallas_ntt.ntt_pallas_passes(
                    self, x, limbs, lanes=128, min_rows=1024,
                    interpret=not on_tpu,
                )
            from lattigo_tpu.ops import mxu_ntt

            if ((on_tpu or FORCE_MXU) and mxu_ntt.supported(self.n)
                    and self._batch_of(x) >= _MXU_MIN_BATCH):
                # headline path: exact int8 four-step on the MXU
                # (2.2x the 3-pass butterfly kernel at the bench shape)
                return mxu_ntt.ntt_mxu(self, x, limbs, interpret=not on_tpu)
            if on_tpu and self._batch_of(x) >= 64:
                from lattigo_tpu.ops import pallas_ntt

                return pallas_ntt.ntt_pallas_passes(
                    self, x, limbs, lanes=128, min_rows=1024,
                    interpret=not on_tpu,
                )
            if on_tpu or FORCE_TILE:
                # small batch: the tile kernel keeps full lane width with
                # coefficients (not batch) on the lane axis
                from lattigo_tpu.ops import tile_ntt

                return tile_ntt.ntt_tile(self, x, limbs, interpret=not on_tpu)
            return self._ntt_fast(x, limbs)
        return self._ntt_simple(x, limbs)

    @staticmethod
    def _batch_of(x: U64) -> int:
        batch = x[0].shape[:-2]
        out = 1
        for b in batch:
            out *= int(b)
        return out

    def _ntt_simple(self, x: U64, limbs: tuple[int, ...]) -> U64:
        n = self.n
        psi = self._tbl_rows(self._psi_pair(False), limbs)
        q = self._tbl_rows(self.q_, limbs)
        two_q = self._tbl_rows(self.two_q_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        u0 = self._tbl_rows(self.u0_, limbs)

        lo, hi = x
        batch = lo.shape[:-2]
        L = lo.shape[-2]
        m = 1
        while m < n:  # m = 1, 2, 4, ..., N/2
            t = n // (2 * m)
            shp = (*batch, L, m, 2, t)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            uu = (lo_r[..., 0, :], hi_r[..., 0, :])
            vv = (lo_r[..., 1, :], hi_r[..., 1, :])
            f = (
                psi[0][..., :, m : 2 * m, None],
                psi[1][..., :, m : 2 * m, None],
            )
            q_b = (q[0][..., None], q[1][..., None])
            two_q_b = (two_q[0][..., None], two_q[1][..., None])
            qinv_b = (qinv[0][..., None], qinv[1][..., None])
            # Lazy CT butterfly: U in [0,4q) folded to [0,2q], V*psi in [0,2q).
            uu = u.select64(u.lt64(two_q_b, uu), u.sub64(uu, two_q_b), uu)
            vv = modred.mred_constant(vv, f, q_b, qinv_b)
            x_new = u.add64(uu, vv)
            y_new = u.sub64(u.add64(uu, two_q_b), vv)
            lo = jnp.stack([x_new[0], y_new[0]], axis=-2).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-2).reshape(*batch, L, n)
            m *= 2
        return modred.bred_add((lo, hi), q, u0)

    def intt(self, x: U64) -> U64:
        """Inverse negacyclic NTT (ring/ntt.go:89-139); exact output."""
        return self.intt_limbs(x, tuple(range(self.level_of(x) + 1)))

    def intt_limbs(self, x: U64, limbs: tuple[int, ...]) -> U64:
        """Inverse NTT with explicit limb-table indices."""
        from lattigo_tpu.parallel import cross_ntt

        act = cross_ntt.active_for(self.n)
        if act is not None:
            # scheme-level cross-chip path: a sharded_ntt(mesh, axis)
            # context routes every transform through the four-step
            # all-to-all kernel (parallel/cross_ntt.py), serving all
            # callers like the reference's single NTT (ring/ntt.go:53-86)
            return cross_ntt.ntt_four_step(
                self, x, act[0], axis=act[1], limbs=limbs, inverse=True)
        if self.n >= self._NTT_FAST_MIN:
            on_tpu = self._on_tpu()
            if FORCE_PALLAS:
                from lattigo_tpu.ops import pallas_ntt

                return pallas_ntt.ntt_pallas_passes(
                    self, x, limbs, inverse=True, lanes=128, min_rows=1024,
                    interpret=not on_tpu,
                )
            from lattigo_tpu.ops import mxu_ntt

            if ((on_tpu or FORCE_MXU) and mxu_ntt.supported(self.n)
                    and self._batch_of(x) >= _MXU_MIN_BATCH):
                return mxu_ntt.ntt_mxu(
                    self, x, limbs, inverse=True, interpret=not on_tpu)
            if on_tpu and self._batch_of(x) >= 64:
                from lattigo_tpu.ops import pallas_ntt

                return pallas_ntt.ntt_pallas_passes(
                    self, x, limbs, inverse=True, lanes=128, min_rows=1024,
                    interpret=not on_tpu,
                )
            if on_tpu or FORCE_TILE:
                from lattigo_tpu.ops import tile_ntt

                return tile_ntt.ntt_tile(
                    self, x, limbs, inverse=True, interpret=not on_tpu
                )
            return self._intt_fast(x, limbs)
        return self._intt_simple(x, limbs)

    def _intt_simple(self, x: U64, limbs: tuple[int, ...]) -> U64:
        n = self.n
        psi_inv = self._tbl_rows(self._psi_pair(True), limbs)
        q = self._tbl_rows(self.q_, limbs)
        two_q = self._tbl_rows(self.two_q_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        n_inv = self._tbl_rows(self.n_inv_, limbs)

        lo, hi = x
        batch = lo.shape[:-2]
        L = lo.shape[-2]
        h = n // 2
        while h >= 1:  # h = N/2, N/4, ..., 1
            t = n // (2 * h)
            shp = (*batch, L, h, 2, t)
            lo_r = lo.reshape(shp)
            hi_r = hi.reshape(shp)
            uu = (lo_r[..., 0, :], hi_r[..., 0, :])
            vv = (lo_r[..., 1, :], hi_r[..., 1, :])
            f = (
                psi_inv[0][..., :, h : 2 * h, None],
                psi_inv[1][..., :, h : 2 * h, None],
            )
            q_b = (q[0][..., None], q[1][..., None])
            two_q_b = (two_q[0][..., None], two_q[1][..., None])
            qinv_b = (qinv[0][..., None], qinv[1][..., None])
            # GS butterfly: X = U+V folded to <= 2q, Y = (U-V)*psiInv.
            x_new = u.add64(uu, vv)
            x_new = u.select64(u.lt64(two_q_b, x_new), u.sub64(x_new, two_q_b), x_new)
            y_new = modred.mred_constant(
                u.sub64(u.add64(uu, two_q_b), vv), f, q_b, qinv_b
            )
            lo = jnp.stack([x_new[0], y_new[0]], axis=-2).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-2).reshape(*batch, L, n)
            h //= 2
        return modred.mred((lo, hi), n_inv, q, qinv)

    def shoup_twiddles(self, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
        """Plain + Shoup-quotient twiddle tables [L, N] for the Pallas
        kernels.  Multiplying by the plain twiddle with Shoup's precomputed
        floor(w*2^64/q) word matches the Montgomery butterfly mod q, and the
        final exact reduction keeps outputs bit-identical."""
        if inverse not in self._shoup_cache:
            mont = self.ntt_psi_inv_host if inverse else self.ntt_psi_host
            plain = np.empty_like(mont)
            shoup = np.empty_like(mont)
            for i, q in enumerate(self.moduli):
                inv_r = pow(1 << 64, -1, q)
                row = [int(v) * inv_r % q for v in mont[i]]
                plain[i] = np.array(row, dtype=np.uint64)
                shoup[i] = np.array(
                    [(p << 64) // q for p in row], dtype=np.uint64
                )
            self._shoup_cache[inverse] = (plain, shoup)
        return self._shoup_cache[inverse]

    # -- TPU-shaped NTT (transpose-split schedule) -------------------------

    def _stage_twiddle(self, limbs, m, t, inverse) -> U64:
        """[L, gc, 1, R] twiddle plane for a transposed-phase stage: element
        (c, r) of the [C, R] view belongs to group r*(C//(2t)) + (c//(2t)),
        twiddle = psi[m + group] (psi_inv for the inverse)."""
        def build():
            C, R = self._LANE, self.n // self._LANE
            gcn = C // (2 * t)
            host = self.ntt_psi_inv_host if inverse else self.ntt_psi_host
            idx = m + np.arange(R)[None, :] * gcn + np.arange(gcn)[:, None]
            return u.from_u64(host[np.array(limbs)][:, idx][:, :, None, :])

        return table(f"{self.key}/stw/{limbs}/{m}/{t}/{int(inverse)}", build)

    @staticmethod
    def _transpose(lo, hi, batch, L, rows, cols):
        lo = lo.reshape(*batch, L, rows, cols).swapaxes(-1, -2)
        hi = hi.reshape(*batch, L, rows, cols).swapaxes(-1, -2)
        return lo.reshape(*batch, L, rows * cols), hi.reshape(*batch, L, rows * cols)

    def _roll_twiddles(self, limbs, inverse) -> tuple[U64, U64, tuple[int, ...]]:
        """Full per-stage twiddle planes [L, S, N] (plain + Shoup) for the
        roll-based schedule — tjit-managed device tables."""
        n = self.n
        stages = []
        t = n // 2
        while t >= 1:
            stages.append(t)
            t //= 2
        if inverse:
            stages = stages[::-1]
        stages = tuple(stages)

        def build():
            plain, shoup = self.shoup_twiddles(inverse)
            plain, shoup = plain[np.array(limbs)], shoup[np.array(limbs)]
            fp = np.empty((len(limbs), len(stages), n), dtype=np.uint64)
            fs = np.empty_like(fp)
            for si, tt in enumerate(stages):
                m = n // (2 * tt)
                fp[:, si] = np.repeat(plain[:, m : 2 * m], 2 * tt, axis=1)
                fs[:, si] = np.repeat(shoup[:, m : 2 * m], 2 * tt, axis=1)
            return u.from_u64(fp), u.from_u64(fs)

        fp, fs = table(f"{self.key}/roll/{limbs}/{int(inverse)}", build)
        return fp, fs, stages

    def ntt_roll(self, x: U64, limbs: tuple[int, ...], inverse: bool = False) -> U64:
        """Roll-based NTT: no reshapes, every stage is a fused full-width
        elementwise pass plus two jnp.rolls for the partner exchange.  Each
        element computes its own butterfly output (2x multiplies of the
        pair-shared form) via Shoup twiddle products; outputs are bit-exact
        with the reference schedule.  This is the fastest formulation on TPU
        (reshape/interleave relayouts dominate the other schedules)."""
        n = self.n
        q = self._tbl_rows(self.q_, limbs)
        two_q = self._tbl_rows(self.two_q_, limbs)
        u0 = self._tbl_rows(self.u0_, limbs)
        fp, fs, stages = self._roll_twiddles(limbs, inverse)

        lo, hi = x
        L = lo.shape[-2]
        pos = jnp.arange(n, dtype=jnp.int32)

        def fold(a, tq):
            return u.select64(u.lt64(tq, a), u.sub64(a, tq), a)

        xx = (lo, hi)
        for si, t in enumerate(stages):
            f = (fp[0][:, si], fp[1][:, si])
            f_s = (fs[0][:, si], fs[1][:, si])
            is_u = (pos & (2 * t - 1)) < t
            roll = lambda a, d: (
                jnp.roll(a[0], d, axis=-1),
                jnp.roll(a[1], d, axis=-1),
            )
            if not inverse:
                folded = fold(xx, two_q)
                mont = modred.mul_shoup(xx, f, f_s, q)
                out_u = u.add64(folded, roll(mont, -t))
                out_v = u.sub64(u.add64(roll(folded, t), two_q), mont)
                xx = u.select64(is_u, out_u, out_v)
            else:
                sum_u = fold(u.add64(xx, roll(xx, -t)), two_q)
                diff = u.sub64(u.add64(roll(xx, t), two_q), xx)
                xx = u.select64(is_u, sum_u, modred.mul_shoup(diff, f, f_s, q))

        if not inverse:
            return modred.bred_add(xx, q, u0)
        ninv = self._tbl_rows(self.n_inv_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        return modred.mred(xx, ninv, q, qinv)

    def _ntt_fast(self, x: U64, limbs: tuple[int, ...]) -> U64:
        n, C = self.n, self._LANE
        R = n // C
        psi = self._tbl_rows(self._psi_pair(False), limbs)
        q = self._tbl_rows(self.q_, limbs)
        two_q = self._tbl_rows(self.two_q_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        u0 = self._tbl_rows(self.u0_, limbs)

        lo, hi = x
        batch = lo.shape[:-2]
        L = lo.shape[-2]
        s1 = lambda tbl: (tbl[0][..., None], tbl[1][..., None])
        s2 = lambda tbl: (tbl[0][..., None, None], tbl[1][..., None, None])

        def butterfly(uu, vv, f, q_b, two_q_b, qinv_b):
            uu = u.select64(u.lt64(two_q_b, uu), u.sub64(uu, two_q_b), uu)
            vv = modred.mred_constant(vv, f, q_b, qinv_b)
            return u.add64(uu, vv), u.sub64(u.add64(uu, two_q_b), vv)

        # phase A: stride t >= C, [*, L, m, 2, t] views (t a multiple of 128)
        m = 1
        while n // (2 * m) >= C:
            t = n // (2 * m)
            shp = (*batch, L, m, 2, t)
            lo_r, hi_r = lo.reshape(shp), hi.reshape(shp)
            f = (psi[0][:, m : 2 * m, None], psi[1][:, m : 2 * m, None])
            x_new, y_new = butterfly(
                (lo_r[..., 0, :], hi_r[..., 0, :]),
                (lo_r[..., 1, :], hi_r[..., 1, :]),
                f, s1(q), s1(two_q), s1(qinv),
            )
            lo = jnp.stack([x_new[0], y_new[0]], axis=-2).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-2).reshape(*batch, L, n)
            m *= 2

        # phase B: stride t < C on the transposed [C, R] view
        lo, hi = self._transpose(lo, hi, batch, L, R, C)
        while m < n:
            t = n // (2 * m)
            gc = C // (2 * t)
            shp = (*batch, L, gc, 2, t, R)
            lo_r, hi_r = lo.reshape(shp), hi.reshape(shp)
            f = self._stage_twiddle(limbs, m, t, inverse=False)
            x_new, y_new = butterfly(
                (lo_r[..., 0, :, :], hi_r[..., 0, :, :]),
                (lo_r[..., 1, :, :], hi_r[..., 1, :, :]),
                f, s2(q), s2(two_q), s2(qinv),
            )
            lo = jnp.stack([x_new[0], y_new[0]], axis=-3).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-3).reshape(*batch, L, n)
            m *= 2
        lo, hi = self._transpose(lo, hi, batch, L, C, R)
        return modred.bred_add((lo, hi), q, u0)

    def _intt_fast(self, x: U64, limbs: tuple[int, ...]) -> U64:
        n, C = self.n, self._LANE
        R = n // C
        psi_inv = self._tbl_rows(self._psi_pair(True), limbs)
        q = self._tbl_rows(self.q_, limbs)
        two_q = self._tbl_rows(self.two_q_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        n_inv = self._tbl_rows(self.n_inv_, limbs)

        lo, hi = x
        batch = lo.shape[:-2]
        L = lo.shape[-2]
        s1 = lambda tbl: (tbl[0][..., None], tbl[1][..., None])
        s2 = lambda tbl: (tbl[0][..., None, None], tbl[1][..., None, None])

        def butterfly(uu, vv, f, q_b, two_q_b, qinv_b):
            x_new = u.add64(uu, vv)
            x_new = u.select64(
                u.lt64(two_q_b, x_new), u.sub64(x_new, two_q_b), x_new
            )
            y_new = modred.mred_constant(
                u.sub64(u.add64(uu, two_q_b), vv), f, q_b, qinv_b
            )
            return x_new, y_new

        # phase B first: stride t < C on the transposed [C, R] view
        lo, hi = self._transpose(lo, hi, batch, L, R, C)
        t = 1
        while t < C:
            h = n // (2 * t)
            gc = C // (2 * t)
            shp = (*batch, L, gc, 2, t, R)
            lo_r, hi_r = lo.reshape(shp), hi.reshape(shp)
            f = self._stage_twiddle(limbs, h, t, inverse=True)
            x_new, y_new = butterfly(
                (lo_r[..., 0, :, :], hi_r[..., 0, :, :]),
                (lo_r[..., 1, :, :], hi_r[..., 1, :, :]),
                f, s2(q), s2(two_q), s2(qinv),
            )
            lo = jnp.stack([x_new[0], y_new[0]], axis=-3).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-3).reshape(*batch, L, n)
            t *= 2
        lo, hi = self._transpose(lo, hi, batch, L, C, R)

        # phase A: stride t >= C, [*, L, h, 2, t] views
        while t <= n // 2:
            h = n // (2 * t)
            shp = (*batch, L, h, 2, t)
            lo_r, hi_r = lo.reshape(shp), hi.reshape(shp)
            f = (
                psi_inv[0][:, h : 2 * h, None],
                psi_inv[1][:, h : 2 * h, None],
            )
            x_new, y_new = butterfly(
                (lo_r[..., 0, :], hi_r[..., 0, :]),
                (lo_r[..., 1, :], hi_r[..., 1, :]),
                f, s1(q), s1(two_q), s1(qinv),
            )
            lo = jnp.stack([x_new[0], y_new[0]], axis=-2).reshape(*batch, L, n)
            hi = jnp.stack([x_new[1], y_new[1]], axis=-2).reshape(*batch, L, n)
            t *= 2
        return modred.mred((lo, hi), n_inv, q, qinv)

    # -- coefficient-wise ops (ring/ring.go) -------------------------------

    def _qc(self, x: U64):
        lvl = self.level_of(x)
        return (
            self._c(self.q_, lvl),
            self._c(self.two_q_, lvl),
            self._c(self.u0_, lvl),
            self._c(self.u1_, lvl),
            self._c(self.qinv_, lvl),
        )

    def add(self, a: U64, b: U64) -> U64:
        q, _, _, _, _ = self._qc(a)
        return modred.cred(u.add64(a, b), q)

    def add_nomod(self, a: U64, b: U64) -> U64:
        return u.add64(a, b)

    def sub(self, a: U64, b: U64) -> U64:
        q, _, _, _, _ = self._qc(a)
        return modred.cred(u.sub64(u.add64(a, q), b), q)

    def sub_nomod(self, a: U64, b: U64) -> U64:
        """a + q - b, without the conditional reduction (result < a + q)."""
        q, _, _, _, _ = self._qc(a)
        return u.sub64(u.add64(a, q), b)

    def neg(self, a: U64) -> U64:
        q, _, _, _, _ = self._qc(a)
        return u.sub64(q, a)

    def reduce(self, a: U64) -> U64:
        q, _, u0, _, _ = self._qc(a)
        return modred.bred_add(a, q, u0)

    def mform(self, a: U64) -> U64:
        q, _, u0, u1, _ = self._qc(a)
        return modred.mform(a, q, u0, u1)

    def inv_mform(self, a: U64) -> U64:
        q, _, _, _, qinv = self._qc(a)
        return modred.inv_mform(a, q, qinv)

    def mul_coeffs_montgomery(self, a: U64, b: U64) -> U64:
        """a .* b * 2^-64 mod q (one operand in Montgomery form)."""
        q, _, _, _, qinv = self._qc(a)
        return modred.mred(a, b, q, qinv)

    def mul_coeffs_montgomery_limbs(
        self, a: U64, b: U64, limbs: tuple[int, ...]
    ) -> U64:
        """mul_coeffs_montgomery where limb row k of a/b lives under modulus
        ``limbs[k]`` (non-prefix limb selections: stacked key-switch planes)."""
        q = self._tbl_rows(self.q_, limbs)
        qinv = self._tbl_rows(self.qinv_, limbs)
        return modred.mred(a, b, q, qinv)

    def reduce_limbs(self, a: U64, limbs: tuple[int, ...]) -> U64:
        """BRedAdd exact reduction with explicit limb-table indices."""
        q = self._tbl_rows(self.q_, limbs)
        u0 = self._tbl_rows(self.u0_, limbs)
        return modred.bred_add(a, q, u0)

    def mul_coeffs_montgomery_constant(self, a: U64, b: U64) -> U64:
        q, _, _, _, qinv = self._qc(a)
        return modred.mred_constant(a, b, q, qinv)

    def mul_coeffs_montgomery_and_add(self, a: U64, b: U64, c: U64) -> U64:
        q, _, _, _, qinv = self._qc(a)
        return modred.cred(u.add64(modred.mred(a, b, q, qinv), c), q)

    def mul_coeffs_montgomery_and_add_nomod(self, a: U64, b: U64, c: U64) -> U64:
        q, _, _, _, qinv = self._qc(a)
        return u.add64(modred.mred(a, b, q, qinv), c)

    def mul_coeffs_montgomery_and_sub(self, a: U64, b: U64, c: U64) -> U64:
        q, _, _, _, qinv = self._qc(a)
        return modred.cred(u.add64(u.sub64(q, modred.mred(a, b, q, qinv)), c), q)

    def mul_coeffs(self, a: U64, b: U64) -> U64:
        """Barrett a .* b mod q (no Montgomery precondition)."""
        q, _, u0, u1, _ = self._qc(a)
        return modred.bred(a, b, q, u0, u1)

    def mul_scalar(self, a: U64, scalar: int) -> U64:
        """a * scalar mod q, per limb, scalar a plain Python int < 2^64."""
        lvl = self.level_of(a)
        mont = _tbl(
            [nt.mform(scalar % q, q) for q in self.moduli[: lvl + 1]],
            (lvl + 1, 1),
        )
        q, _, _, _, qinv = self._qc(a)
        return modred.mred(a, mont, q, qinv)

    def add_scalar_bigint(self, a: U64, scalar: int) -> U64:
        """a + scalar mod q per limb, arbitrary-precision scalar."""
        lvl = self.level_of(a)
        c = _tbl([scalar % q for q in self.moduli[: lvl + 1]], (lvl + 1, 1))
        return modred.cred(u.add64(a, c), self._c(self.q_, lvl))

    def sub_scalar_bigint(self, a: U64, scalar: int) -> U64:
        lvl = self.level_of(a)
        c = _tbl(
            [(q - scalar % q) % q for q in self.moduli[: lvl + 1]], (lvl + 1, 1)
        )
        return modred.cred(u.add64(a, c), self._c(self.q_, lvl))

    def mul_scalar_bigint(self, a: U64, scalar: int) -> U64:
        """a * scalar mod q for an arbitrary-precision scalar."""
        lvl = self.level_of(a)
        mont = _tbl(
            [nt.mform(scalar % q, q) for q in self.moduli[: lvl + 1]],
            (lvl + 1, 1),
        )
        q, _, _, _, qinv = self._qc(a)
        return modred.mred(a, mont, q, qinv)

    # -- remaining coefficient-wise utilities (ring/ring.go:146-801) -------

    def mod_scalar(self, a: U64, m: int) -> U64:
        """Each coefficient mod an arbitrary 64-bit m (ring/ring.go:146)."""
        mb = nt.bred_params(m)
        return modred.bred_add(
            a, u.const64(m, (1, 1)), u.const64(mb[0], (1, 1))
        )

    def and_scalar(self, a: U64, m: int) -> U64:
        return u.and64(a, u.const64(m, (1, 1)))

    def or_scalar(self, a: U64, m: int) -> U64:
        return u.or64(a, u.const64(m, (1, 1)))

    def xor_scalar(self, a: U64, m: int) -> U64:
        return u.xor64(a, u.const64(m, (1, 1)))

    def add_scalar(self, a: U64, scalar: int) -> U64:
        return self.add_scalar_bigint(a, scalar)

    def sub_scalar(self, a: U64, scalar: int) -> U64:
        return self.sub_scalar_bigint(a, scalar)

    def shift(self, a: U64, n_shift: int) -> U64:
        """Cyclic left shift of the coefficient slices (ring/ring.go:575)."""
        return (
            jnp.roll(a[0], -n_shift, axis=-1),
            jnp.roll(a[1], -n_shift, axis=-1),
        )

    def mul_by_pow2(self, a: U64, pow2: int) -> U64:
        """a * 2^pow2 mod q (ring/ring.go:629)."""
        return self.mul_scalar(a, 1 << pow2)

    def mult_by_monomial(self, a: U64, degree: int) -> U64:
        """a(X) * X^degree in the negacyclic ring (ring/ring.go:663-723)."""
        n = self.n
        shift = degree % (n << 1)
        if shift == 0:
            return a
        lvl = self.level_of(a)
        q = self._c(self.q_, lvl)
        x = a
        if shift >= n:
            x = self.neg(x)
            shift -= n
        if shift == 0:
            return x
        rolled = (
            jnp.roll(x[0], shift, axis=-1),
            jnp.roll(x[1], shift, axis=-1),
        )
        # wrapped-around coefficients pick up a sign flip
        def build(s=shift):
            m = np.zeros(n, dtype=bool)
            m[:s] = True
            return m

        idx = table(f"{self.key}/monomask/{shift}", build)
        neg = u.sub64(q, rolled)
        neg = u.select64(u.eq64(rolled, u.const64(0)), rolled, neg)
        return u.select64(jnp.asarray(idx), neg, rolled)

    def mul_by_vector_montgomery(self, a: U64, vector) -> U64:
        """a .* vector (Montgomery per-slot weights) (ring/ring.go:726)."""
        vec = u.from_u64(np.asarray(vector, dtype=np.uint64).reshape(1, -1))
        lvl = self.level_of(a)
        return modred.mred(
            a, vec, self._c(self.q_, lvl), self._c(self.qinv_, lvl)
        )

    def bit_reverse(self, a: U64) -> U64:
        """Permute coefficients into bit-reversed order (ring/ring.go:749)."""
        logn = self.log_n
        idx = table(
            f"{self.key}/brev",
            lambda: np.array(
                [nt.bit_reverse(j, logn) for j in range(self.n)], dtype=np.int32
            ),
        )
        return jnp.take(a[0], idx, axis=-1), jnp.take(a[1], idx, axis=-1)

    def _rotate_rows(self, lvl: int, n_rot: int) -> np.ndarray:
        """Cached psi^(2*n_rot) power table for Galois rotation, built once
        per (level, rotation) with vectorized square-and-multiply."""
        key = ("rot", lvl, n_rot)
        if key not in self._tw_cache:
            rows = np.empty((lvl + 1, self.n), dtype=np.uint64)
            exps = np.arange(self.n, dtype=np.uint64)
            for i, q in enumerate(self.moduli[: lvl + 1]):
                psi = nt.inv_mform(self.psi_mont[i], q)
                root = pow(psi * psi % q, n_rot, q)
                # gal[j] = root^j * 2^64 mod q via per-bit masked products
                # (object dtype: 60-bit modular products overflow uint64)
                acc = np.full(self.n, nt.mform(1, q), dtype=object)
                rb = root
                for b in range(self.log_n):
                    sel = (exps >> np.uint64(b)) & np.uint64(1) == 1
                    if sel.any():
                        acc[sel] = acc[sel] * rb % q
                    rb = rb * rb % q
                rows[i] = acc.astype(np.uint64)
            self._tw_cache[key] = rows
        return self._tw_cache[key]

    def rotate(self, a: U64, n_rot: int) -> U64:
        """Galois rotation in NTT form via psi^2 twisting (ring/ring.go:775);
        requires bit-reversed-permuted data before the NTT."""
        lvl = self.level_of(a)
        tw = table(
            f"{self.key}/rotrows/{lvl}/{n_rot}",
            lambda: u.from_u64(self._rotate_rows(lvl, n_rot)),
        )
        return modred.mred(
            a, tw, self._c(self.q_, lvl), self._c(self.qinv_, lvl)
        )

    def exp(self, a: U64, e: int) -> U64:
        """a(X)^e in the ring (NTT pointwise powering; the reference's Exp at
        ring/ring.go:441 clobbers its own output with a stray InvNTT — this
        is the corrected semantic)."""
        x = self.ntt(a)
        acc = None
        while e > 0:
            if e & 1:
                acc = x if acc is None else self.mul_coeffs(acc, x)
            x = self.mul_coeffs(x, x)
            e >>= 1
        if acc is None:
            acc = self.set_coeffs_bigint([1] + [0] * (self.n - 1))
            return acc
        return self.intt(acc)

    def mul_poly(self, a: U64, b: U64) -> U64:
        """Full negacyclic polynomial product via NTT (ring/ring.go:358)."""
        fa = self.ntt(a)
        fb = self.ntt(b)
        return self.intt(self.mul_coeffs_montgomery(self.mform(fa), fb))

    def mul_poly_naive(self, a: U64, b: U64) -> U64:
        """Schoolbook negacyclic convolution, host-side (ring/ring.go:383) —
        the slow exact reference twin for tests."""
        n = self.n
        av = u.to_u64(a)
        bv = u.to_u64(b)
        L = av.shape[-2]
        out = np.zeros((L, n), dtype=np.uint64)
        for i in range(L):
            q = self.moduli[i]
            acc = [0] * n
            for j in range(n):
                aj = int(av[i, j])
                if aj == 0:
                    continue
                for k in range(n):
                    t = aj * int(bv[i, k]) % q
                    idx = j + k
                    if idx >= n:
                        acc[idx - n] = (acc[idx - n] - t) % q
                    else:
                        acc[idx] = (acc[idx] + t) % q
            out[i] = np.array(acc, dtype=np.uint64)
        return u.from_u64(out)

    # -- host <-> device coefficient conversion ----------------------------

    def set_coeffs_bigint(self, coeffs, lvl: int | None = None) -> U64:
        """Arbitrary-precision coefficients -> RNS residue planes
        (ring/ring_context.go:424-467).  Vectorized over numpy object
        arrays: the big-int arithmetic runs as one C-level ufunc loop per
        limb instead of a Python loop per coefficient."""
        L = self.L if lvl is None else lvl + 1
        co = np.asarray(coeffs, dtype=object)
        rows = np.empty((L, self.n), dtype=np.uint64)
        for i in range(L):
            rows[i] = (co % self.moduli[i]).astype(np.uint64)
        return u.from_u64(rows)

    def poly_to_bigint_vec(self, x: U64) -> np.ndarray:
        """CRT reconstruction over the carried limbs
        (ring/ring_context.go:384-421), vectorized: an object ndarray of
        Python ints in [0, prod(q_i)) built from C-level ufunc loops."""
        arr = u.to_u64(x)
        L = arr.shape[-2]
        mod = 1
        for q in self.moduli[:L]:
            mod *= q
        acc = np.zeros(self.n, dtype=object)
        for i in range(L):
            qi = self.moduli[i]
            crt = mod // qi
            crt *= pow(crt, -1, qi)
            acc += arr[i].astype(object) * crt
        return acc % mod

    def poly_to_bigint(self, x: U64) -> list[int]:
        """List-of-ints view of poly_to_bigint_vec."""
        return self.poly_to_bigint_vec(x).tolist()

    def equal(self, a: U64, b: U64) -> bool:
        ra = u.to_u64(self.reduce(a))
        rb = u.to_u64(self.reduce(b))
        return bool((ra == rb).all())
