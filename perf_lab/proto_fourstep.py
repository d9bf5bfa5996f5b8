"""Numpy prototype of the four-step negacyclic NTT factorization.

Pins the exact index/twiddle bookkeeping against the reference schedule
(ring/ntt.go:53-139, bit-reversed merged-psi tables) before the Pallas
int8-MXU kernel is written.

Factorization (N = n1*n2, j = j1*n2 + j2, k = k2*n1 + k1):
  X_k = sum_j x_j psi^j w^{jk},  w = psi^2 (order N)
      = sum_{j2} w^{j2(k2 n1 + k1)} psi^{j2} * A[k1, j2]
  A[k1, j2] = sum_{j1} x[j1, j2] * psi^{n2 j1} w^{n2 j1 k1}      (64-dim matmul)
  T[k1, j2] = w^{j2 k1} * psi^{j2}                                (twiddle)
  O[r, c]   = sum_{j2} (A*T)[k1, j2] * w^{n1 j2 k2}               (128-dim matmul)
  reference out[r*n2 + c] = X_{rev(r*n2+c)} -> k1 = rev6(r), k2 = rev7(c)
  (row/column bit-reversals baked into the A-matrix rows / B-matrix cols).

Inverse (input y[p] = X_{rev(p)}, output natural):
  x_j = N^-1 psi^{-j} sum_k X_k w^{-jk},  j = j1*n2 + j2
  G[k1, j2] = sum_{k2} X[k1, k2] w^{-n1 k2 j2}        (contract k2=128, cols of y)
  T'[k1,j2] = w^{-j2 k1} * psi^{-j2}
  x[j1, j2] = N^-1 sum_{k1} (G*T')[k1, j2] * w^{-n2 j1 k1} psi^{-n2 j1}
"""
import numpy as np

from lattigo_tpu.ops import number_theory as nt


def bitrev(i, bits):
    return int(bin(i + (1 << bits))[3:][::-1], 2)


def build_fwd(q, n1, n2):
    """Return (MA [n1, n1], T [n1, n2], MB [n2, n2]) integer matrices mod q.

    out2d[r, c] = ( MA @ x2d * T ) @ MB  (all mod q), x2d[j1, j2].
    MA[r, j1] = psi^{n2 j1} w^{n2 j1 rev(r)};  T[r, j2] = w^{j2 rev(r)} psi^{j2}
    MB[j2, c] = w^{n1 j2 rev(c)}
    """
    N = n1 * n2
    g = nt.primitive_root(q)
    psi = pow(g, (q - 1) // (2 * N), q)
    w = psi * psi % q
    b1, b2 = n1.bit_length() - 1, n2.bit_length() - 1
    MA = np.zeros((n1, n1), dtype=object)
    T = np.zeros((n1, n2), dtype=object)
    MB = np.zeros((n2, n2), dtype=object)
    for r in range(n1):
        k1 = bitrev(r, b1)
        for j1 in range(n1):
            MA[r, j1] = pow(psi, n2 * j1, q) * pow(w, n2 * j1 * k1, q) % q
        for j2 in range(n2):
            T[r, j2] = pow(w, j2 * k1, q) * pow(psi, j2, q) % q
    for j2 in range(n2):
        for c in range(n2):
            MB[j2, c] = pow(w, n1 * j2 * bitrev(c, b2), q)
    return MA, T, MB


def build_inv(q, n1, n2):
    """Return (MG [n2, n2], T' [n1, n2], MH [n1, n1]) for the inverse.

    x2d[j1, j2] = MH @ ( (y2d @ MG) * T' );  y2d[r, c] (reference NTT layout).
    MG[c, j2] = w^{-n1 rev(c) j2};  T'[r, j2] = w^{-j2 rev(r)} psi^{-j2}
    MH[j1, r] = N^-1 psi^{-n2 j1} w^{-n2 j1 rev(r)}
    """
    N = n1 * n2
    g = nt.primitive_root(q)
    psi = pow(g, (q - 1) // (2 * N), q)
    wi = pow(psi * psi % q, -1, q)
    psii = pow(psi, -1, q)
    ninv = pow(N, -1, q)
    b1, b2 = n1.bit_length() - 1, n2.bit_length() - 1
    MG = np.zeros((n2, n2), dtype=object)
    Tp = np.zeros((n1, n2), dtype=object)
    MH = np.zeros((n1, n1), dtype=object)
    for c in range(n2):
        k2 = bitrev(c, b2)
        for j2 in range(n2):
            MG[c, j2] = pow(wi, n1 * k2 * j2, q)
    for r in range(n1):
        k1 = bitrev(r, b1)
        for j2 in range(n2):
            Tp[r, j2] = pow(wi, j2 * k1, q) * pow(psii, j2, q) % q
        for j1 in range(n1):
            MH[j1, r] = ninv * pow(psii, n2 * j1, q) * pow(wi, n2 * j1 * k1, q) % q
    return MG, Tp, MH


def fwd(x, q, MA, T, MB):
    n1, n2 = MA.shape[0], MB.shape[0]
    x2 = np.array([int(v) for v in x], dtype=object).reshape(n1, n2)
    A = (MA @ x2) % q
    A = (A * T) % q
    O = (A @ MB) % q
    return O.reshape(-1)


def inv(y, q, MG, Tp, MH):
    n1, n2 = MH.shape[0], MG.shape[0]
    y2 = np.array([int(v) for v in y], dtype=object).reshape(n1, n2)
    G = (y2 @ MG) % q            # G[r, j2] = sum_c y2[r, c] MG[c, j2]
    G = (G * Tp) % q
    x2 = (MH @ G) % q
    return x2.reshape(-1)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lattigo_tpu.ops import ring as ring_mod
    from lattigo_tpu.ops import u64 as u

    for n1, n2, qbits in [(4, 8, 60), (8, 16, 60), (64, 128, 60)]:
        N = n1 * n2
        q = nt.generate_ntt_primes(qbits, N.bit_length() - 1, 1)[0]
        ring = ring_mod.Ring(N, [q])
        rng = np.random.default_rng(1)
        x = rng.integers(0, q, N, dtype=np.uint64)
        ref = u.to_u64(ring._ntt_simple(u.from_u64(x.reshape(1, N)), (0,)))[0]
        MA, T, MB = build_fwd(q, n1, n2)
        got = fwd(x, q, MA, T, MB)
        ok_f = all(int(a) == int(b) for a, b in zip(got, ref))
        MG, Tp, MH = build_inv(q, n1, n2)
        back = inv(ref, q, MG, Tp, MH)
        ok_i = all(int(a) == int(b) for a, b in zip(back, x))
        print(f"N={N} ({n1}x{n2}) q={q}: fwd {'OK' if ok_f else 'MISMATCH'}, inv {'OK' if ok_i else 'MISMATCH'}", flush=True)
