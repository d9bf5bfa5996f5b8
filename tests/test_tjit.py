"""tjit: table-threading jit wrapper.

Verifies (a) tjit'd pipelines are bit-exact vs the direct (constant-baking)
path, (b) managed tables are HLO *arguments*, shrinking the lowered payload
by orders of magnitude (the round-3 PN14 'HTTP 413' failure mode), and
(c) traces are cached per signature."""

import jax
import numpy as np

from lattigo_tpu import tjit as T
from lattigo_tpu.ops import ring as ring_mod
from lattigo_tpu.ops import u64 as u
from lattigo_tpu.ops.default_params import default_qi

N = 256


def _ring():
    log_n = N.bit_length() - 1
    return ring_mod.Ring(N, list(default_qi(log_n, 3)))


def test_tjit_bit_exact_ntt_roundtrip():
    ring = _ring()
    rng = np.random.default_rng(7)
    x = rng.integers(0, ring.moduli[0], size=(3, N), dtype=np.uint64)
    for i, q in enumerate(ring.moduli):
        x[i] %= q
    xs = u.from_u64(x)

    direct = u.to_u64(ring.intt(ring.ntt(xs)))
    f = T.tjit(lambda a: ring.intt(ring.ntt(a)))
    threaded = u.to_u64(f(xs))
    np.testing.assert_array_equal(direct, threaded)
    # ntt alone, against the reference schedule
    np.testing.assert_array_equal(
        u.to_u64(ring.ntt(xs)), u.to_u64(T.tjit(ring.ntt)(xs))
    )


def test_tjit_shrinks_lowered_payload():
    ring = ring_mod.Ring(4096, list(default_qi(12, 2)))
    rng = np.random.default_rng(3)
    x = rng.integers(0, ring.moduli[0], size=(2, 4096), dtype=np.uint64)
    xs = u.from_u64(x)

    baked = len(jax.jit(ring.ntt).lower(xs).as_text())

    wrapped = T.tjit(ring.ntt)
    wrapped(xs)  # build + compile
    (jfn, names), = wrapped._cache.values()
    assert names, "expected managed tables to be recorded"
    tbls = tuple(tuple(T._device_leaves(n)) for n in names)
    txt = jfn.lower(tbls, tuple(jax.tree_util.tree_leaves(xs))).as_text()
    # threading must leave no big embedded literals (the PN14 blowup was
    # tens of MB of dense<...> constants); what remains is program text
    import re

    largest = max(
        (len(m.group(0)) for m in re.finditer(r"dense<[^>]*>", txt)), default=0
    )
    assert largest < 8192, largest
    assert len(txt) < baked, (len(txt), baked)


def test_tjit_trace_cache_and_static_leaves():
    calls = {"n": 0}

    def fn(a, k):
        calls["n"] += 1
        return a[0] + np.uint32(k), a[1]

    f = T.tjit(fn)
    x = u.from_u64(np.arange(8, dtype=np.uint64))
    r1 = f(x, 3)
    r2 = f(x, 3)  # cache hit: no retrace
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    # record + inject traces for the first call only
    assert calls["n"] == 2
    f(x, 4)  # static leaf change -> new entry
    assert calls["n"] == 4
    assert f.trace_count() == 2


def test_tjit_galois_rotate_exact():
    ring = _ring()
    from lattigo_tpu.ops import galois

    rng = np.random.default_rng(11)
    x = rng.integers(0, ring.moduli[0], size=(3, N), dtype=np.uint64)
    xs = u.from_u64(x)
    gal = 5
    direct = u.to_u64(galois.permute_ntt(xs, gal))
    threaded = u.to_u64(T.tjit(lambda a: galois.permute_ntt(a, gal))(xs))
    np.testing.assert_array_equal(direct, threaded)


def test_tjit_nested_inlines():
    ring = _ring()
    inner = T.tjit(ring.ntt)
    outer = T.tjit(lambda a: ring.intt(inner(a)))
    rng = np.random.default_rng(5)
    x = rng.integers(0, ring.moduli[0], size=(3, N), dtype=np.uint64)
    xs = u.from_u64(x)
    np.testing.assert_array_equal(u.to_u64(outer(xs)), x % np.array(ring.moduli, dtype=np.uint64)[:, None])
