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
        at least one cycle (exact byte-consumption order of ring/prng.go:77-103)."""
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
