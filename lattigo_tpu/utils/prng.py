"""Deterministic keyed PRNG and common-reference-polynomial generator.

Byte-exact counterpart of utils/prng.go (keyed blake2b-512 hash chain with a
clock counter) and ring/prng.go (clock-addressable uniform polynomial stream).
These run host-side: common randomness is generated once per protocol round
and shipped to the device as constants, so Python speed is irrelevant — what
matters is that every party (or mesh host) derives identical bytes from the
same (key, seed, clock), which this chain guarantees.
"""

from __future__ import annotations

import hashlib

import numpy as np

from lattigo_tpu.ops import u64 as u


class PRNG:
    """Keyed blake2b-512 hash chain (utils/prng.go:13-73).

    Clock() emits the 64-byte digest of everything absorbed so far and
    re-absorbs it.  Forward security requires a key.
    """

    def __init__(self, key: bytes | None = None):
        self._key = key or b""
        self._h = hashlib.blake2b(key=self._key, digest_size=64)
        self.clock_cycle = 0
        self._seed = b""

    def seed(self, seed: bytes | None):
        self._h = hashlib.blake2b(key=self._key, digest_size=64)
        self._seed = seed or b""
        self._h.update(self._seed)
        self.clock_cycle = 0

    def get_seed(self) -> bytes:
        return self._seed

    def clock(self) -> bytes:
        digest = self._h.copy().digest()
        self._h.update(digest)
        self.clock_cycle += 1
        return digest

    def set_clock(self, n: int):
        if self.clock_cycle > n:
            raise ValueError("cannot set prng clock to a previous state")
        while self.clock_cycle != n:
            self.clock()


class CRPGenerator:
    """Deterministic common reference polynomial stream (ring/prng.go:11-103).

    All parties seeded identically and clocked to the same cycle produce the
    same uniform polynomial — the MPC broadcast replacement.
    """

    def __init__(self, key: bytes | None, ring):
        self.prng = PRNG(key)
        self.ring = ring
        self.masks = ring.mask

    def get_clock(self) -> int:
        return self.prng.clock_cycle

    def seed(self, seed: bytes | None):
        self.prng.seed(seed)

    def set_clock(self, n: int):
        self.prng.set_clock(n)

    def clock_poly(self) -> u.U64:
        """One uniform polynomial over the full basis; advances the clock by
        at least one cycle (exact byte-consumption order of ring/prng.go:77-103).

        Vectorized: digests are generated speculatively from a clone of the
        hash state and decoded to a big-endian word stream; the per-(coeff,
        modulus) rejection walk runs in native C (lattigo_tpu/native) with a
        NumPy fallback; exactly the consumed digests are then committed to
        the real chain, so clock/stream semantics match the scalar loop
        byte for byte (verified by tests/test_ring_ops.py CRP determinism
        and the cross-check in tests/test_prng_walk.py)."""
        ring = self.ring
        L, N = ring.L, ring.n
        masks = np.array(self.masks, dtype=np.uint64)
        qs = np.array(ring.moduli, dtype=np.uint64)
        spec = self.prng._h.copy()
        digests: list[bytes] = []

        def fetch(n_dig: int) -> np.ndarray:
            chunks = []
            for _ in range(n_dig):
                d = spec.copy().digest()
                spec.update(d)
                digests.append(d)
                chunks.append(d)
            return np.frombuffer(b"".join(chunks), dtype=">u8").astype(np.uint64)

        words_per_coeff = sum(
            (int(m) + 1) / float(q) for q, m in zip(ring.moduli, self.masks)
        )
        need_words = int(N * words_per_coeff * 1.02) + 8 * L + 16
        words = fetch((need_words + 7) // 8)
        out = np.empty((L, N), dtype=np.uint64)
        while True:
            k = _walk(words, masks, qs, L, N, out)
            if k >= 0:
                break
            words = np.concatenate([words, fetch(max(64, len(words) // 32))])
        consumed = (int(k) + 7) // 8
        # absorbing the consumed digests in one update is stream-equivalent
        self.prng._h.update(b"".join(digests[:consumed]))
        self.prng.clock_cycle += consumed
        return u.from_u64(out)

    def clock_poly_scalar(self) -> u.U64:
        """Reference scalar walk (the literal ring/prng.go:77-103 loop);
        kept as the exactness twin for tests."""
        ring = self.ring
        out = np.empty((ring.L, ring.n), dtype=np.uint64)
        buf = self.prng.clock()
        for i in range(ring.n):
            for j, qi in enumerate(ring.moduli):
                while True:
                    if len(buf) < 8:
                        buf = self.prng.clock()
                    coeff = int.from_bytes(buf[:8], "big") & self.masks[j]
                    buf = buf[8:]
                    if coeff < qi:
                        break
                out[j, i] = coeff
        return u.from_u64(out)


def _walk(words: np.ndarray, masks: np.ndarray, qs: np.ndarray, L: int, N: int, out: np.ndarray) -> int:
    """Exact-order rejection walk: fill out[j, i] (i outer, j inner) from the
    word stream; return words consumed or -1 if the stream ran dry."""
    from lattigo_tpu import native

    lib = native.crp_walk_lib()
    if lib is not None:
        import ctypes

        W = np.ascontiguousarray(words)
        pt = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        return int(lib.crp_walk(pt(W), len(W), pt(masks), pt(qs), L, N, pt(out)))
    return _walk_numpy(words, masks, qs, L, N, out)


def _walk_numpy(words, masks, qs, L, N, out) -> int:
    """NumPy fallback: acceptance table per phase + run-jumping.  Between
    rejections the phase advances deterministically, so each accepted run is
    validated with one diagonal gather; Python iterates only per rejection."""
    M = len(words)
    A = (words[:, None] & masks[None, :]) < qs[None, :]  # [M, L]
    vals = words[:, None] & masks[None, :]
    slot = 0  # global slot index = i * L + j
    k = 0
    while slot < N * L:
        remaining = N * L - slot
        span = min(remaining, M - k)
        if span <= 0:
            return -1
        idx = np.arange(span)
        phases = (slot + idx) % L
        ok = A[k + idx, phases]
        bad = np.argmin(ok) if not ok.all() else span
        if bad > 0:
            i_coord = (slot + idx[:bad]) // L
            j_coord = phases[:bad]
            out[j_coord, i_coord] = vals[k + idx[:bad], j_coord]
            slot += bad
            k += bad
        if bad < span:
            k += 1  # the rejected word
        elif span < remaining:
            return -1
    return k
