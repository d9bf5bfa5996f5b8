"""OpProfiler: per-op timing wrapper around evaluators."""

import numpy as np

from lattigo_tpu.utils.profiling import OpProfiler


def test_op_profiler_counts_and_report():
    import jax

    from lattigo_tpu.models import bfv

    params = bfv.Parameters(
        log_n=8, t=65537, log_qi=(46, 46), log_pi=(47,), log_qi_mul=(60, 60)
    ).gen_from_log_moduli()
    kg = bfv.KeyGenerator(params, rng_key=jax.random.key(1))
    sk, pk = kg.gen_key_pair()
    enc = bfv.Encoder(params)
    er = bfv.Encryptor(params, pk=pk)
    ev = OpProfiler(bfv.Evaluator(params))
    m = np.arange(params.n, dtype=np.uint64) % params.t
    ct = er.encrypt(enc.encode_uint(m))
    out = ev.add(ct, ct)
    out = ev.mul(out, ct)
    assert ev.calls["add"] == 1 and ev.calls["mul"] == 1
    assert ev.times["mul"] > 0
    rep = ev.report()
    assert "mul" in rep and "add" in rep
    d = ev.as_dict()
    assert d["add"]["calls"] == 1
