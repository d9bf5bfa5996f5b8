"""Table-threading jit: compile pipelines without baking big tables as HLO
constants.

JAX embeds every host array (and every closed-over ``jax.Array``) that a
traced function touches as a literal constant in the lowered HLO.  For this
framework that means NTT twiddle planes, Galois index tables and key-switch
tables — tens of MB per trace at reference default parameters — get baked
into every compiled program: compile payloads blow past the remote-compile
request limit at PN14+ and every (level, scale) retrace re-serializes the
same tables (the reference has no analog issue: Go just reads its context
arrays at run time, ring/ring_context.go:18-51).

``tjit`` fixes this with a record/inject scheme around a global table
registry:

* Precompute sites wrap their host table builds in :func:`table`, which
  registers the (deterministically named) host value once and returns it.
* ``tjit(fn)`` first runs one abstract trace (``jax.eval_shape``) in
  *record* mode to learn which table names ``fn``'s trace touches for the
  given argument shapes, then builds a ``jax.jit`` whose leading argument
  is the tuple of those tables, re-entering ``fn`` in *inject* mode where
  :func:`table` returns the passed-in tracers instead of host arrays.
* Each table is placed on device once (``jax.device_put``) and reused by
  every compiled program; traces are cached per (pytree structure, leaf
  avals, static leaves), so e.g. a Chebyshev circuit re-uses one trace per
  (level, scale) op signature.

Tables smaller than :data:`MIN_MANAGED_BYTES` stay inline constants —
threading ``[L, 1]`` modulus rows through call signatures would cost more
in argument plumbing than it saves in payload.

Outside a ``tjit`` call nothing changes: :func:`table` returns host arrays
and ops behave exactly as before (tests, eager use, nested jits).
"""

from __future__ import annotations

import contextvars
import functools
import hashlib

import jax
import numpy as np

# name -> (treedef, [np.ndarray leaves], managed: bool)
_HOST: dict[str, tuple] = {}
# name -> [jax.Array leaves]
_DEVICE: dict[str, list] = {}

# mode: None | ("record", set[str]) | ("inject", dict[str, list])
_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "lattigo_tjit_mode", default=None
)

MIN_MANAGED_BYTES = 1 << 12  # tables below this stay trace constants


def content_key(*parts) -> str:
    """Short stable digest for table names built from param content (e.g. a
    ring's (n, moduli)), so identical contexts share registry entries."""
    h = hashlib.blake2b(repr(parts).encode(), digest_size=8)
    return h.hexdigest()


def table(name: str, builder):
    """Register-or-fetch the precomputed table ``name``.

    ``builder`` is called once ever (per process) to produce a pytree of
    host numpy arrays.  Returns that pytree — as host arrays normally, or
    as the jit-argument tracers inside a ``tjit`` inject trace.
    """
    ent = _HOST.get(name)
    if ent is None:
        leaves, treedef = jax.tree_util.tree_flatten(builder())
        leaves = [np.asarray(l) for l in leaves]
        managed = sum(l.nbytes for l in leaves) >= MIN_MANAGED_BYTES
        ent = (treedef, leaves, managed)
        _HOST[name] = ent
    treedef, leaves, managed = ent
    mode = _MODE.get()
    if mode is not None and managed:
        kind, payload = mode
        if kind == "record":
            payload.add(name)
        elif name in payload:  # inject
            return treedef.unflatten(payload[name])
    return treedef.unflatten(leaves)


def _device_leaves(name: str) -> list:
    dev = _DEVICE.get(name)
    if dev is None:
        dev = [jax.device_put(l) for l in _HOST[name][1]]
        _DEVICE[name] = dev
    return dev


def clear_device_cache():
    """Drop device copies (host registry stays); next tjit call re-places."""
    _DEVICE.clear()


def _is_dynamic(leaf) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray)) or hasattr(leaf, "aval")


class _TjitFn:
    """The callable built by :func:`tjit`; per-signature trace cache."""

    def __init__(self, fn):
        self._fn = fn
        self._cache: dict = {}
        functools.update_wrapper(self, fn)

    def __call__(self, *args):
        if _MODE.get() is not None:
            # nested tjit: inline into the active record/inject trace
            return self._fn(*args)
        leaves, treedef = jax.tree_util.tree_flatten(args)
        dyn_idx = tuple(i for i, l in enumerate(leaves) if _is_dynamic(l))
        dyn_set = set(dyn_idx)
        statics = tuple(
            (i, l) for i, l in enumerate(leaves) if i not in dyn_set
        )
        avals = tuple(
            (np.shape(leaves[i]), np.asarray(leaves[i]).dtype if isinstance(leaves[i], np.ndarray) else leaves[i].dtype)
            for i in dyn_idx
        )
        key = (treedef, avals, statics)
        ent = self._cache.get(key)
        if ent is None:
            ent = self._build(key, treedef, dyn_idx, statics, args)
            self._cache[key] = ent
        jfn, names = ent
        tbls = tuple(tuple(_device_leaves(n)) for n in names)
        dyn = tuple(leaves[i] for i in dyn_idx)
        return jfn(tbls, dyn)

    def _build(self, key, treedef, dyn_idx, statics, args):
        fn = self._fn

        def rebuild(dyn):
            full = [None] * (len(dyn_idx) + len(statics))
            for i, l in statics:
                full[i] = l
            for i, l in zip(dyn_idx, dyn):
                full[i] = l
            return jax.tree_util.tree_unflatten(treedef, full)

        leaves = jax.tree_util.tree_flatten(args)[0]
        dyn_concrete = tuple(leaves[i] for i in dyn_idx)
        used: set[str] = set()
        tok = _MODE.set(("record", used))
        try:
            jax.eval_shape(lambda dyn: fn(*rebuild(dyn)), dyn_concrete)
        finally:
            _MODE.reset(tok)
        names = tuple(sorted(used))

        def inner(tbls, dyn):
            bound = {n: list(t) for n, t in zip(names, tbls)}
            tok2 = _MODE.set(("inject", bound))
            try:
                return fn(*rebuild(dyn))
            finally:
                _MODE.reset(tok2)

        return jax.jit(inner), names

    def trace_count(self) -> int:
        return len(self._cache)


def tjit(fn) -> _TjitFn:
    """jit ``fn`` with registry tables threaded as device arguments.

    Arguments must be pytrees; array leaves (jax or numpy) become traced
    arguments, any other leaves (ints, floats, None, strings) are static
    and become part of the trace-cache key.
    """
    return _TjitFn(fn)
