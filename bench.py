"""BASELINE benchmark suite (driver entry point).

Config #1 (headline, the only bare-JSON line on stdout): forward NTT
throughput, N=2^13, 60-bit moduli, one chip — BASELINE.json's north-star
metric, bit-exact against the reference schedule on hardware in BOTH
directions (the same transform the golden vectors check in
tests/test_ntt_golden.py; harness anchor ring/ring_benchmark_test.go:162).

Configs #2-#6 (stderr lines prefixed ``CONFIG``, appended incrementally to
BENCH_SCHEMES.json as each finishes): the reference's scheme-level
benchmark families on their default parameter sets —
  #2 BFV mult+relin, PN13QP218 (bfv/bfv_benchmark_test.go:11-17)
  #3 CKKS mult+rescale+hoisted-rotate, PN14QP438 (ckks/ckks_benchmarks_test.go:8)
  #4 CKKS Chebyshev degree-31 pipeline, PN15QP880 (per-op JitEvaluator)
  #5 dBFV steady-state per-protocol Gen/Agg/Finalize, PN12QP109
     (dbfv/dbfv_benchmark_test.go:9-17) + the 8-party end-to-end pipeline
  #6 per-op micro table (encode/encrypt/decrypt/add/mul/relin/rotate)

All timed regions are ``tjit`` programs: precomputed tables and keys ride
in as device ARGUMENTS (lattigo_tpu/tjit.py), not trace-baked constants —
this is what lets PN14/PN15 compile within the remote-compile request
limit.  Timing discipline (measured, PERF_NOTES.md): the runtime executes
LAZILY — block_until_ready does not force execution, unobserved results
may never run, and repeated (program, buffers) pairs return cached
results.  Every timed call therefore (a) reads back an on-device scalar
digest, and (b) uses inputs no prior execution has seen (in-jit fori
chains, or rolled content-distinct variants, one per call).

Budget discipline: a global deadline (BENCH_BUDGET seconds, default 1500)
is checked before each config; keygen runs OUTSIDE the per-config guard;
compiles hit a persistent compilation cache (.jax_cache/); results are
flushed to BENCH_SCHEMES.json after EVERY config.
"""

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# diagnosis hook: `kill -USR1 <pid>` dumps all thread stacks to stderr.
# (No dump_traceback_later auto-watchdog: walking the frames of a thread
# mid-trace segfaulted the interpreter — observed once, dmesg 18043s.)
faulthandler.register(signal.SIGUSR1, file=sys.stderr)

RESULTS = []
T_START = time.time()
BUDGET = float(os.environ.get("BENCH_BUDGET", "1500"))


def remaining() -> float:
    return BUDGET - (time.time() - T_START)


def flush_results():
    with open("BENCH_SCHEMES.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 1), "unit": unit,
           "vs_baseline": None if vs_baseline is None else round(float(vs_baseline), 4)}
    rec.update(extra)
    RESULTS.append(rec)
    print("CONFIG " + json.dumps(rec), file=sys.stderr, flush=True)
    flush_results()
    return rec


class Timeout(Exception):
    pass


def guarded(seconds):
    def deco(fn):
        def run(*a, **k):
            def handler(sig, frm):
                raise Timeout(f"{fn.__name__} exceeded {seconds}s")
            budget = int(min(seconds, max(30, remaining())))
            old = signal.signal(signal.SIGALRM, handler)
            signal.alarm(budget)
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001 - report, keep benching
                emit(fn.__name__ + "_error", 0, f"{type(e).__name__}: {str(e)[:160]}")
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        return run
    return deco


_DIGEST_JIT = None


def _force(out) -> int:
    """Reduce a result pytree to one scalar ON DEVICE and read it back —
    the only reliable execution fence on this runtime: block_until_ready
    does not force lazy executions, unobserved results may never run, and
    repeated (program, buffers) pairs return cached results.

    The digest program is created ONCE: a fresh jax.jit per call costs a
    ~0.45 s remote compile that would swamp small-op timings."""
    import jax
    import jax.numpy as jnp

    global _DIGEST_JIT
    if _DIGEST_JIT is None:
        _DIGEST_JIT = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))
    leaves = jax.tree_util.tree_leaves(out)
    return int(_DIGEST_JIT(leaves[0]))


def digest_time(fn, z0, chain, calls, label, fixed=()):
    """One tjit program: fori_loop of ``chain`` applications of fn plus a
    scalar digest, called ``calls`` times with the digest read back each
    call (z chains across calls, so no two executions share inputs)."""
    import jax
    import jax.numpy as jnp

    from lattigo_tpu import tjit as T

    def chained(z, *fx):
        out = jax.lax.fori_loop(0, chain, lambda _, a: fn(a, *fx), z)
        leaves = jax.tree_util.tree_leaves(out)
        d = jnp.sum(leaves[0], dtype=jnp.uint32) ^ jnp.sum(
            leaves[-1], dtype=jnp.uint32
        )
        return out, d

    cf = T.tjit(chained)
    t0 = time.time()
    z, d = cf(z0, *fixed)
    _ = int(d)
    compile_s = time.time() - t0
    print(f"{label}: compiled+first in {compile_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    for _i in range(calls):
        z, d = cf(z, *fixed)
        _ = int(d)
    return (time.time() - t0) / (chain * calls), compile_s


def variant_time(fn, variants, label=None):
    """Digest-forced timing over ALL-DISTINCT argument tuples (one timed
    call per variant; repeats of any (program, buffers) pair would be
    served from the runtime cache)."""
    t0 = time.time()
    _force(fn(*variants[0]))
    compile_s = time.time() - t0
    if label:
        print(f"{label}: compiled+first in {compile_s:.1f}s",
              file=sys.stderr, flush=True)
    t0 = time.time()
    for v in variants[1:]:
        _force(fn(*v))
    return (time.time() - t0) / (len(variants) - 1), compile_s


def rolled_ct_variants(ct, n):
    """n distinct same-signature ciphertext variants via jitted coefficient
    rolls (cost-identical, content-distinct — cache-busting)."""
    import jax
    import jax.numpy as jnp

    roller = jax.jit(
        lambda c, k: jax.tree_util.tree_map(lambda a: jnp.roll(a, k, axis=-1), c)
    )
    return [roller(ct, jnp.int32(i)) for i in range(n)]


# --------------------------------------------------------------------------
# Config #1 — headline NTT throughput (kept byte-compatible with round 1)
# --------------------------------------------------------------------------


def bench_ntt_headline():
    import jax

    from lattigo_tpu import tjit as T
    from lattigo_tpu.ops import u64 as u
    from lattigo_tpu.ops.ring import Ring

    n = 8192
    moduli = [576460752303439873, 576460752303702017]  # golden-vector pair
    ring = Ring(n, moduli)
    B = 1024
    rng = np.random.default_rng(0)
    x = rng.integers(0, moduli[0], size=(B, len(moduli), n), dtype=np.uint64)
    x %= np.array(moduli, dtype=np.uint64)[None, :, None]
    X = u.from_u64(x)
    X = (jax.device_put(X[0]), jax.device_put(X[1]))

    ntt_j = T.tjit(ring.ntt)
    intt_j = T.tjit(ring.intt)
    del T  # digest_time builds its own tjit programs

    # hardware bit-exactness, forward AND inverse, vs the reference schedule.
    # NOTE: no eager device ops here — eager slicing through the axon tunnel
    # can wedge indefinitely; slices run jitted, the reference runs on the
    # host copy under the CPU backend.
    y = ntt_j(X)
    z = intt_j(y)
    slice1 = jax.jit(lambda a: (a[0][:1], a[1][:1]))
    y1 = jax.tree.map(np.asarray, slice1(y))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = u.to_u64(jax.jit(lambda a: ring._ntt_simple(a, (0, 1)))(u.from_u64(x[:1])))
    assert (ref == u.to_u64(y1)).all(), "fwd NTT mismatch on hardware"
    assert (u.to_u64((np.asarray(z[0]), np.asarray(z[1]))) == x).all(), \
        "inv NTT roundtrip mismatch on hardware"
    print("bit-exactness (fwd vs reference schedule, inv roundtrip) passed on device",
          file=sys.stderr, flush=True)

    # chain=200: the ~27 ms tunnel-sync floor (PERF_NOTES) amortizes to
    # ~0.14 ms/iteration — <4% of the measured per-call time
    per_call, compile_s = digest_time(ring.ntt, X, chain=200, calls=3, label="ntt")
    rate = B * len(moduli) / per_call
    return {"metric": "ntt_per_sec_n8192_60bit", "value": round(rate, 1),
            "unit": "NTT/s/chip", "vs_baseline": round(rate / 1e6, 4),
            "compile_s": round(compile_s, 1)}


def bench_ntt_single_ct():
    """Single-ciphertext ([L, N], batch 1) NTT rate through the tile kernel
    — the shape every scheme-level op on one ciphertext sees."""
    import jax

    from lattigo_tpu import tjit as T
    from lattigo_tpu.ops import u64 as u
    from lattigo_tpu.ops.ring import Ring

    n = 8192
    moduli = [576460752303439873, 576460752303702017]
    ring = Ring(n, moduli)
    rng = np.random.default_rng(1)
    x = rng.integers(0, moduli[0], size=(len(moduli), n), dtype=np.uint64)
    x %= np.array(moduli, dtype=np.uint64)[:, None]
    X = u.from_u64(x)
    X = (jax.device_put(X[0]), jax.device_put(X[1]))

    @guarded(150)
    def run():
        # chain deep: the tunnel's ~27 ms forced-sync cost per call is an
        # environment artifact (PERF_NOTES.md), amortized to <2 us/iter here
        per, compile_s = digest_time(ring.ntt, X, chain=400, calls=2,
                                     label="ntt single-ct")
        emit("ntt_single_ct_n8192_60bit", len(moduli) / per, "NTT/s/chip",
             note="batch=1 [L,N] tile-kernel path", compile_s=round(compile_s, 1))

    run.__name__ = "ntt_single_ct"
    run()


# --------------------------------------------------------------------------
# Config #2 — BFV mult+relin at PN13QP218
# --------------------------------------------------------------------------


def bench_bfv_mul_relin():
    import jax

    from lattigo_tpu import tjit as T
    from lattigo_tpu.models import bfv

    params = bfv.default_params(bfv.PN13QP218)
    # keygen/encode/encrypt OUTSIDE the guarded+timed region
    kgen = bfv.KeyGenerator(params, rng_key=jax.random.key(1))
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(1)
    pt = enc.encode_uint(rng.integers(0, params.t, params.n, dtype=np.uint64))
    ct = encryptor.encrypt(pt)

    @guarded(420)
    def run():
        # chain=12 amortizes the ~27 ms/call tunnel sync to ~2 ms/op
        per, compile_s = digest_time(
            lambda c, k: ev.relinearize(ev.mul(c, c), k), ct, chain=12,
            calls=2, label="bfv mul+relin PN13", fixed=(rlk,))
        emit("bfv_mul_relin_pn13qp218", 1.0 / per, "op/s/chip",
             params="PN13QP218", anchor="bfv/bfv_benchmark_test.go:11",
             compile_s=round(compile_s, 1))

    run.__name__ = "bfv_mul_relin"
    run()


# --------------------------------------------------------------------------
# Config #3 — CKKS mult+rescale+hoisted rotation at PN14QP438
# --------------------------------------------------------------------------


def bench_ckks_mul_rescale_rotate():
    import jax

    from lattigo_tpu import tjit as T
    from lattigo_tpu.models import ckks

    params = ckks.default_params(ckks.PN14QP438)
    kgen = ckks.KeyGenerator(params, rng_key=jax.random.key(2))
    sk, pk = kgen.gen_key_pair_sparse(hw=128)
    rlk = kgen.gen_relin_key(sk)
    rot = ckks.RotationKeys()
    kgen.gen_rot("left", sk, 1, rot)  # one hoisted rotation key (not 27)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, pk=pk)
    ev = ckks.Evaluator(params)

    rng = np.random.default_rng(2)
    ct = encryptor.encrypt(enc.encode(
        rng.uniform(-1, 1, params.slots).astype(np.complex128)))

    pipeline = T.tjit(
        lambda c, k, r: ev.rotate_hoisted(ev.rescale(ev.mul_relin(c, c, k)), [1], r)[1]
    )

    @guarded(600)
    def run():
        # 13 content-distinct, cost-identical inputs (rolled copies):
        # digest-forced, no (program, buffers) repeats.  Single-ct latency
        # includes the environment's ~27 ms forced-sync floor (PERF_NOTES).
        cts = rolled_ct_variants(ct, 13)
        per, compile_s = variant_time(
            lambda c: pipeline(c, rlk, rot), [(c,) for c in cts],
            label="ckks pipeline")
        emit("ckks_mul_rescale_pn14qp438", 1.0 / per, "mul+rescale+hrot/s/chip",
             params="PN14QP438", anchor="ckks/ckks_benchmarks_test.go:8",
             pipeline_ms=round(per * 1e3, 2), compile_s=round(compile_s, 1))

        # throughput form: the same pipeline on an 8-ct batch (the CKKS
        # evaluator is batch-polymorphic), sync amortized 8x
        import jax.numpy as jnp

        B = 8
        batcher = jax.jit(lambda c, k: jax.tree_util.tree_map(
            lambda a: jnp.stack([jnp.roll(a, k + i, axis=-1) for i in range(B)]), c))
        variants = [(batcher(ct, jnp.int32(100 * i)),) for i in range(7)]
        per_b, compile_b = variant_time(
            lambda c: pipeline(c, rlk, rot), variants,
            label="ckks pipeline batch=8")
        emit("ckks_mul_rescale_pn14qp438_batch8", B / per_b,
             "mul+rescale+hrot/s/chip", params="PN14QP438 batch=8",
             anchor="ckks/ckks_benchmarks_test.go:8",
             per_ct_ms=round(per_b * 1e3 / B, 2), compile_s=round(compile_b, 1))

    run.__name__ = "ckks_mul_rescale_rotate"
    run()


# --------------------------------------------------------------------------
# Config #3b — CKKS at PN16QP1761, the reference's largest default set
# --------------------------------------------------------------------------


def bench_ckks_pn16():
    """encode -> encrypt -> mul+relin -> rescale at PN16QP1761 (N=2^16,
    ckks/params.go:35-87's largest shipped set) — the config that stresses
    compile payloads, VMEM and the NTT dispatch at 2^16 (VERDICT r4
    missing #5).  Precision-asserted before timing."""
    import jax

    from lattigo_tpu import tjit as T
    from lattigo_tpu.models import ckks

    params = ckks.default_params(ckks.PN16QP1761)
    kg = ckks.KeyGenerator(params, rng_key=jax.random.key(3))
    sk, pk = kg.gen_key_pair_sparse(hw=192)
    rlk = kg.gen_relin_key(sk)
    enc = ckks.Encoder(params)
    er = ckks.Encryptor(params, pk=pk)
    dec = ckks.Decryptor(params, sk)
    ev = ckks.Evaluator(params)
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.slots).astype(np.complex128)
    ct = er.encrypt(enc.encode(v))

    pipeline = T.tjit(lambda c0, c1, k, s: ev.rescale(ev.mul_relin(
        ckks.Ciphertext([c0, c1], s), ckks.Ciphertext([c0, c1], s), k)))

    @guarded(800)
    def run():
        out = pipeline(ct.value[0], ct.value[1], rlk, ct.scale)
        _force(out.value[0])
        # correctness: decode and assert precision vs v*v
        got = enc.decode(dec.decrypt(out))
        err = np.abs(got - v * v)
        bits = float(-np.log2(np.median(err) + 1e-300))
        assert bits >= 12, f"PN16 precision too low: {bits:.1f} bits"
        print(f"PN16 mul+relin+rescale precision: {bits:.1f} bits median",
              file=sys.stderr, flush=True)
        cts = rolled_ct_variants(ct, 5)
        per, compile_s = variant_time(
            lambda c: pipeline(c.value[0], c.value[1], rlk, c.scale),
            [(c,) for c in cts], label="ckks pn16 mul+relin+rescale")
        emit("ckks_mul_relin_rescale_pn16qp1761", 1.0 / per, "op/s/chip",
             params="PN16QP1761", anchor="ckks/params.go:35",
             op_ms=round(per * 1e3, 1), precision_bits=round(bits, 1),
             compile_s=round(compile_s, 1))

    run.__name__ = "ckks_pn16"
    run()


# --------------------------------------------------------------------------
# Config #4 — CKKS degree-31 Chebyshev at PN15QP880 (per-op JitEvaluator)
# --------------------------------------------------------------------------


def bench_ckks_cheby31():
    n_before = len(RESULTS)
    _cheby_run(700, "PN15QP880")
    if len(RESULTS) == n_before or RESULTS[-1]["metric"].endswith("_error"):
        if remaining() > 300:
            _cheby_run(280, "PN14QP438")  # fallback scale if the big set fails


def _cheby_run(budget, name):
    @guarded(budget)
    def _cheby_impl():
        _cheby_body(name)
    _cheby_impl.__name__ = f"cheby31_{name}"
    _cheby_impl()


def _cheby_body(name):
    import math

    import jax

    from lattigo_tpu.models import ckks

    params = ckks.default_params(getattr(ckks, name))
    kgen = ckks.KeyGenerator(params, rng_key=jax.random.key(3))
    sk, pk = kgen.gen_key_pair_sparse(hw=128)
    rlk = kgen.gen_relin_key(sk)
    enc = ckks.Encoder(params)
    encryptor = ckks.Encryptor(params, pk=pk)
    # per-op compiled evaluator: one trace per (op, level, scale) signature,
    # reused across the whole BSGS tree — no monolithic circuit program
    ev = ckks.JitEvaluator(params)

    cheby = ckks.approximate(lambda x: complex(1 / (1 + math.exp(-x.real)), 0), -8, 8, 31)
    rng = np.random.default_rng(3)
    ct = encryptor.encrypt(enc.encode(
        rng.uniform(-8, 8, params.slots).astype(np.complex128)))
    cts = rolled_ct_variants(ct, 4)

    def pipeline(c):
        return ckks.evaluate_cheby_fast(ev, c, cheby, rlk)

    t0 = time.time()
    _force(pipeline(cts[0]))
    compile_s = time.time() - t0
    traces = sum(f.trace_count() for f in ev._jops.values())
    print(f"cheby31: compiled+first in {compile_s:.1f}s ({traces} op traces)",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for c in cts[1:]:
        _force(pipeline(c))
    per = (time.time() - t0) / (len(cts) - 1)
    emit(f"ckks_cheby31_{name.lower()}", 1.0 / per, "eval/s/chip",
         params=f"{name} deg=31", slots_per_sec=round(params.slots / per, 1),
         op_traces=traces, anchor="examples/ckks/examples_ckks.go:22",
         compile_s=round(compile_s, 1))


# --------------------------------------------------------------------------
# Config #5 — dBFV: steady-state per-protocol Gen/Agg/Finalize + pipeline
# --------------------------------------------------------------------------


def _keyed(proto, method):
    """tjit a protocol phase with an explicit PRNG key argument so warm
    calls reuse one trace (the protocol's internal fold_in counter would
    otherwise retrace per call)."""
    from lattigo_tpu import tjit as T

    def fn(key, *args):
        with proto.using_key(key):
            return method(*args)

    return T.tjit(fn)


def bench_threshold_steady():
    """Per-protocol steady-state timings, PN12QP109 — the shape of
    dbfv/dbfv_benchmark_test.go:9-17 (Gen/Agg/Finalize per protocol).

    Chain-amortized (VERDICT r4 item 2): each phase runs as an in-jit
    fori chain (outputs fed back as inputs, or a PRNG key threaded
    through the carry for randomized Gen phases so sampling cannot be
    loop-hoisted); the ~27 ms tunnel-sync floor amortizes to
    ``residual_floor_us`` per row."""
    import jax
    import jax.numpy as jnp

    from lattigo_tpu.models import bfv, dbfv
    from lattigo_tpu.utils.prng import CRPGenerator

    params = bfv.default_params(bfv.PN12QP109)
    ctx = bfv.get_context(params)
    kg0 = bfv.KeyGenerator(params, rng_key=jax.random.key(40))
    kg1 = bfv.KeyGenerator(params, rng_key=jax.random.key(41))
    sk0, pk0 = kg0.gen_key_pair()
    sk1, pk1 = kg1.gen_key_pair()
    crpg = CRPGenerator(b"bench", ctx.ring_qp)
    crpg.seed(b"steady")
    crp = crpg.clock_poly()
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk0)
    rng = np.random.default_rng(9)
    pt = enc.encode_uint(rng.integers(0, params.t, params.n, dtype=np.uint64))
    ct = encryptor.encrypt(pt)
    k0 = jax.random.key_data(jax.random.key(77))

    def timed(label, step, z0, chain, fixed=()):
        per, compile_s = digest_time(step, z0, chain=chain, calls=2,
                                     fixed=fixed, label=f"dbfv_{label}")
        emit(f"dbfv_{label}_pn12qp109", per * 1e6, "us/op",
             anchor="dbfv/dbfv_benchmark_test.go:9", chain=chain,
             residual_floor_us=round(27000 / chain, 1),
             compile_s=round(compile_s, 1))

    def keyed_step(proto, fn):
        """carry (key_data, out): out = fn() under an evolving proto key —
        the key dependency forces per-iteration sampling."""

        def step(z, *fx):
            kdata, _ = z
            key = jax.random.wrap_key_data(kdata)
            with proto.using_key(key):
                out = fn(*fx)
            return jax.random.key_data(jax.random.fold_in(key, 1)), out

        return step

    @guarded(1200)
    def run():
        ckg = dbfv.CKGProtocol(params)
        s_ckg = None
        with ckg.using_key(jax.random.key(70)):
            s_ckg = ckg.gen_share(sk0.sk, crp)
        timed("ckg_gen", keyed_step(ckg, lambda: ckg.gen_share(sk0.sk, crp)),
              (k0, s_ckg), chain=48)
        timed("ckg_agg", lambda s, s2: ckg.aggregate(s, s2),
              s_ckg, chain=256, fixed=(s_ckg,))

        cks = dbfv.CKSProtocol(params)
        with cks.using_key(jax.random.key(71)):
            s_cks = cks.gen_share(sk0.sk, sk1.sk, ct)
        timed("cks_gen",
              keyed_step(cks, lambda: cks.gen_share(sk0.sk, sk1.sk, ct)),
              (k0, s_cks), chain=48)
        timed("cks_agg", lambda s, s2: cks.aggregate(s, s2),
              s_cks, chain=256, fixed=(s_cks,))
        timed("cks_finalize", lambda c, sh: cks.key_switch(sh, c),
              ct, chain=64, fixed=(s_cks,))

        pcks = dbfv.PCKSProtocol(params)
        with pcks.using_key(jax.random.key(72)):
            s_pcks = pcks.gen_share(sk0.sk, pk1, ct)
        timed("pcks_gen",
              keyed_step(pcks, lambda: pcks.gen_share(sk0.sk, pk1, ct)),
              (k0, s_pcks), chain=32)
        timed("pcks_agg", lambda s, s2: pcks.aggregate(s, s2),
              s_pcks, chain=256, fixed=(s_pcks,))
        timed("pcks_finalize", lambda c, sh: pcks.key_switch(sh, c),
              ct, chain=64, fixed=(s_pcks,))

        rkg = dbfv.RKGProtocol(params)
        with rkg.using_key(jax.random.key(78)):
            u_eph = rkg.new_ephemeral_key()
        crps = [crpg.clock_poly() for _ in range(params.beta)]
        crp_b = (jnp.stack([p[0] for p in crps]),
                 jnp.stack([p[1] for p in crps]))
        with rkg.using_key(jax.random.key(73)):
            r1 = rkg.gen_share_round_one(u_eph, sk0.sk, crp_b)
            r2 = rkg.gen_share_round_two(r1, sk0.sk, crp_b)
            r3 = rkg.gen_share_round_three(r2, u_eph, sk0.sk)
        timed("rkg_round1_gen",
              keyed_step(rkg, lambda: rkg.gen_share_round_one(
                  u_eph, sk0.sk, crp_b)), (k0, r1), chain=16)
        timed("rkg_round2_gen",
              keyed_step(rkg, lambda: rkg.gen_share_round_two(
                  r1, sk0.sk, crp_b)), (k0, r2), chain=16)
        timed("rkg_round3_gen",
              keyed_step(rkg, lambda: rkg.gen_share_round_three(
                  r2, u_eph, sk0.sk)), (k0, r3), chain=16)

        def rkgfin_step(r3c, r2c):
            rlk = rkg.gen_relinearization_key(r2c, r3c)
            d = jnp.sum(jax.tree_util.tree_leaves(rlk)[0], dtype=jnp.uint32)
            return jax.tree_util.tree_map(lambda a: a + d, r3c)

        timed("rkg_finalize", rkgfin_step, r3, chain=16, fixed=(r2,))

        rtg = dbfv.RTGProtocol(params)
        with rtg.using_key(jax.random.key(74)):
            s_rtg = rtg.gen_share("left", 1, sk0.sk, crp_b)
        timed("rtg_gen",
              keyed_step(rtg, lambda: rtg.gen_share("left", 1, sk0.sk, crp_b)),
              (k0, s_rtg), chain=16)
        timed("rtg_agg", lambda s, s2: rtg.aggregate(s, s2),
              s_rtg, chain=128, fixed=(s_rtg,))

        refresh = dbfv.RefreshProtocol(params)
        with refresh.using_key(jax.random.key(75)):
            s_ref = refresh.gen_share(sk0.sk, ct, crp)
        timed("refresh_gen",
              keyed_step(refresh, lambda: refresh.gen_share(sk0.sk, ct, crp)),
              (k0, s_ref), chain=32)
        timed("refresh_agg", lambda s, s2: refresh.aggregate(s, s2),
              s_ref, chain=256, fixed=(s_ref,))
        timed("refresh_finalize", lambda c, cr, sh: refresh.finalize(c, cr, sh),
              ct, chain=32, fixed=(crp, s_ref))

    run.__name__ = "threshold_steady"
    run()


def bench_threshold_8party():
    """8-party CKG -> encrypt -> PCKS -> Refresh pipeline, PN12QP109.

    Round-4 ran this EAGERLY (every protocol call a tunnel round trip):
    80.5 s/pipeline — all dispatch, no compute (VERDICT r4 weak #3).  Now
    each phase is ONE tjit program with the party fan-out vmapped over a
    stacked (keys, sks) axis — share generation runs as batch-8 kernels
    (the MXU NTT path) and aggregation is an in-program fold, mirroring
    pir.go:352-388's per-phase timing discipline.  Per-phase rows +
    the full chained pipeline are emitted."""
    import jax
    import jax.numpy as jnp

    from lattigo_tpu import tjit as T
    from lattigo_tpu.models import bfv, dbfv
    from lattigo_tpu.utils.prng import CRPGenerator

    params = bfv.default_params(bfv.PN12QP109)
    ctx = bfv.get_context(params)
    n_parties = 8
    kgens = [bfv.KeyGenerator(params, rng_key=jax.random.key(10 + i))
             for i in range(n_parties)]
    sks = [kg.gen_secret_key() for kg in kgens]
    sks_stacked = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *[sk.sk for sk in sks])
    crpg = CRPGenerator(b"bench", ctx.ring_qp)
    crpg.seed(b"seed")
    crp = crpg.clock_poly()
    crs = crpg.clock_poly()
    enc = bfv.Encoder(params)
    rng = np.random.default_rng(5)
    pt = enc.encode_uint(rng.integers(0, params.t, params.n, dtype=np.uint64))

    ckg = dbfv.CKGProtocol(params)
    pcks = dbfv.PCKSProtocol(params)
    refresh = dbfv.RefreshProtocol(params)
    target_kg = bfv.KeyGenerator(params, rng_key=jax.random.key(90))
    sk_out, pk_out = target_kg.gen_key_pair()
    encryptor = bfv.Encryptor(params, pk=bfv.PublicKey((crp, crp)))  # pk set per call

    def fold8(proto, stacked):
        acc = jax.tree_util.tree_map(lambda a: a[0], stacked)
        for i in range(1, n_parties):
            acc = proto.aggregate(
                acc, jax.tree_util.tree_map(lambda a, _i=i: a[_i], stacked))
        return acc

    def vgen(proto, fn):
        """vmap share generation over (key, sk): batch-8 kernels."""

        def one(kdata, sk):
            with proto.using_key(jax.random.wrap_key_data(kdata)):
                return fn(sk)

        return jax.vmap(one, in_axes=(0, 0))

    def keys8(key, salt):
        ks = jax.vmap(lambda i: jax.random.key_data(
            jax.random.fold_in(jax.random.wrap_key_data(key), salt * 64 + i))
        )(jnp.arange(n_parties))
        return ks

    # ---- phase programs (each one tjit) ----
    def ckg_phase(kdata, sks_st, crp_):
        shares = vgen(ckg, lambda sk: ckg.gen_share(sk, crp_))(
            keys8(kdata, 1), sks_st)
        return ckg.gen_public_key(fold8(ckg, shares), crp_)

    def enc_phase(kdata, pk, pt_):
        encryptor.pk = pk
        encryptor._key = jax.random.wrap_key_data(kdata)
        encryptor._n_used = 0
        return encryptor.encrypt(pt_)

    def pcks_phase(kdata, sks_st, pk_o, ct_):
        shares = vgen(pcks, lambda sk: pcks.gen_share(sk, pk_o, ct_))(
            keys8(kdata, 2), sks_st)
        return pcks.key_switch(fold8(pcks, shares), ct_)

    def refresh_phase(kdata, sks_st, ct_, crs_):
        shares = vgen(refresh, lambda sk: refresh.gen_share(sk, ct_, crs_))(
            keys8(kdata, 3), sks_st)
        return refresh.finalize(ct_, crs_, fold8(refresh, shares))

    def pipeline(z, sks_st, crp_, crs_, pk_o):
        kdata, pt_ = z
        pk = ckg_phase(kdata, sks_st, crp_)
        ct_ = enc_phase(kdata, pk, pt_)
        ct2 = pcks_phase(kdata, sks_st, pk_o, ct_)
        out = refresh_phase(kdata, sks_st, ct2, crs_)
        k2 = jax.random.key_data(
            jax.random.fold_in(jax.random.wrap_key_data(kdata), 7))
        return k2, bfv.Plaintext(out.value[0])

    k0 = jax.random.key_data(jax.random.key(77))

    @guarded(900)
    def run():
        # end-to-end pipeline, chained (pt evolves from the refreshed c0)
        per, compile_s = digest_time(
            pipeline, (k0, pt), chain=4, calls=3, label="8party pipeline",
            fixed=(sks_stacked, crp, crs, pk_out))
        emit("dbfv_8party_ckg_pcks_refresh_pn12qp109", per * 1e3,
             "ms/pipeline", parties=8,
             anchor="dbfv/dbfv_benchmark_test.go:9", chain=4,
             residual_floor_ms=round(27 / 4, 1), compile_s=round(compile_s, 1))

        # per-phase attribution (pir.go:352-388 discipline)
        pk_c = T.tjit(ckg_phase)(k0, sks_stacked, crp)
        ct_c = T.tjit(enc_phase)(k0, pk_c, pt)
        ct2_c = T.tjit(pcks_phase)(k0, sks_stacked, pk_out, ct_c)

        def phase_step(fn, rewrap):
            def step(z, *fx):
                kdata, _ = z
                out = fn(kdata, *fx)
                k2 = jax.random.key_data(
                    jax.random.fold_in(jax.random.wrap_key_data(kdata), 9))
                return k2, rewrap(out)
            return step

        for label, fn, carry0, fx, chain in (
            ("ckg", ckg_phase, pk_c, (sks_stacked, crp), 8),
            ("encrypt", lambda k, pk, p: enc_phase(k, pk, p), ct_c,
             (pk_c, pt), 16),
            ("pcks", pcks_phase, ct2_c, (sks_stacked, pk_out, ct_c), 8),
            ("refresh", refresh_phase, ct2_c, (sks_stacked, ct_c, crs), 8),
        ):
            per_p, comp = digest_time(
                phase_step(fn, lambda o: o), (k0, carry0), chain=chain,
                calls=2, label=f"8party phase {label}", fixed=fx)
            emit(f"dbfv_8party_phase_{label}_pn12qp109", per_p * 1e3,
                 "ms/phase", parties=8, chain=chain,
                 residual_floor_ms=round(27 / chain, 1),
                 compile_s=round(comp, 1))

    run.__name__ = "threshold_8party"
    run()


# --------------------------------------------------------------------------
# Per-op micro table — BFV PN12QP109 (bfv/bfv_benchmark_test.go:11-17)
# --------------------------------------------------------------------------


def bench_per_op_table():
    """Chain-amortized per-op timings (VERDICT r4 item 2): each op runs as
    an in-jit fori chain feeding its output back into its input (with a
    shape-preserving rewrap where output type differs), so the ~27 ms
    tunnel-sync floor amortizes to 27000/chain us — annotated per row as
    ``residual_floor_us``.  Randomized ops thread an explicit PRNG key
    through the chain carry so noise generation cannot be loop-hoisted."""
    import jax
    import jax.numpy as jnp

    from lattigo_tpu.models import bfv

    params = bfv.default_params(bfv.PN12QP109)
    kgen = bfv.KeyGenerator(params, rng_key=jax.random.key(7))
    sk, pk = kgen.gen_key_pair()
    rlk = kgen.gen_relin_key(sk)
    rot = bfv.RotationKeys()
    kgen.gen_rot("left", sk, 1, rot)
    enc = bfv.Encoder(params)
    encryptor = bfv.Encryptor(params, pk=pk)
    dec = bfv.Decryptor(params, sk)
    ev = bfv.Evaluator(params)

    rng = np.random.default_rng(7)
    m = rng.integers(0, params.t, params.n, dtype=np.uint64)
    pt = enc.encode_uint(m)
    ct = encryptor.encrypt(pt)
    # raw uint32 key data in the chain carry (typed key arrays don't sum
    # in the digest); rebuilt with wrap_key_data inside the step
    key0 = jax.random.key_data(jax.random.key(99))

    def timed(label, step, z0, chain, fixed=()):
        per, compile_s = digest_time(step, z0, chain=chain, calls=2,
                                     fixed=fixed, label=f"bfv_{label}")
        emit(f"bfv_{label}_pn12qp109", per * 1e6, "us/op",
             anchor="bfv/bfv_benchmark_test.go:11", chain=chain,
             residual_floor_us=round(27000 / chain, 1),
             compile_s=round(compile_s, 1))

    def enc_step(z):
        kdata, p = z
        key = jax.random.wrap_key_data(kdata)
        encryptor._key, encryptor._n_used = key, 0
        c = encryptor.encrypt(p)
        k2 = jax.random.key_data(jax.random.fold_in(key, 1))
        return k2, bfv.Plaintext(c.value[0])

    def dec_step(c):
        p = dec.decrypt(c)
        return bfv.Ciphertext([p.value, c.value[1]])

    def mul_step(c, c2):
        out = ev.mul(c, c2)
        return bfv.Ciphertext(out.value[:2])

    @guarded(900)
    def run():
        timed("encrypt", enc_step, (key0, pt), chain=48)
        timed("decrypt", dec_step, ct, chain=64)
        timed("add", lambda c, c2: ev.add(c, c2), ct, chain=512, fixed=(ct,))
        timed("mul", mul_step, ct, chain=32, fixed=(ct,))
        timed("mul_relin",
              lambda c, c2, k: ev.relinearize(ev.mul(c, c2), k),
              ct, chain=24, fixed=(ct, rlk))
        timed("rotate_cols", lambda c, r: ev.rotate_columns(c, 1, r),
              ct, chain=32, fixed=(rot,))

    run.__name__ = "per_op_table"
    run()


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    dev = jax.devices()[0]
    print(f"device: {dev}  budget: {BUDGET:.0f}s", file=sys.stderr, flush=True)

    headline = bench_ntt_headline()
    RESULTS.append(headline)
    print("CONFIG " + json.dumps(headline), file=sys.stderr, flush=True)
    flush_results()
    # the headline is the single stdout JSON line the driver records
    print(json.dumps(headline), flush=True)

    # cheapest-first so a budget overrun sacrifices the expensive
    # Chebyshev config, not three cheap ones
    configs = [
        bench_ntt_single_ct,
        bench_bfv_mul_relin,
        bench_per_op_table,
        bench_threshold_steady,
        bench_threshold_8party,
        bench_ckks_mul_rescale_rotate,
        bench_ckks_pn16,
        bench_ckks_cheby31,
    ]
    for cfg in configs:
        if remaining() < 60:
            emit(cfg.__name__ + "_skipped", 0, f"global budget exhausted "
                 f"({BUDGET:.0f}s)")
            continue
        print(f"-- {cfg.__name__} (remaining {remaining():.0f}s)",
              file=sys.stderr, flush=True)
        cfg()

    flush_results()
    print("wrote BENCH_SCHEMES.json", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
