"""Per-op profiling: wall-time and call-count accounting for evaluator
pipelines, plus an XLA trace hook.

SURVEY.md section 5's tracing subsystem: the reference relies on `go test
-bench` for per-op cost; the TPU framework's analog is (a) an evaluator
wrapper that times every dispatched op at the Python boundary (device-
synchronized, so times are real execution, not async dispatch), and (b)
`xla_trace` for capturing a TensorBoard-loadable XLA profile of a region
(per-kernel HLO cost attribution).

Example::

    ev = OpProfiler(ckks.JitEvaluator(params))
    out = ckks.evaluate_cheby_fast(ev, ct, cheby, rlk)
    print(ev.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class OpProfiler:
    """Transparent evaluator wrapper timing every method call.

    Each profiled call blocks on its result, so per-op times include real
    device execution (async dispatch would otherwise attribute all time to
    whichever op happens to force the value).
    """

    _digest = None

    def __init__(self, evaluator):
        self._ev = evaluator
        self.times = defaultdict(float)
        self.calls = defaultdict(int)

    @classmethod
    def _force(cls, out):
        """Digest readback: on lazy runtimes (axon) block_until_ready does
        not force execution — only observing a value does."""
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves(out)
        if not leaves:
            return
        if cls._digest is None:
            cls._digest = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))
        int(cls._digest(leaves[0]))

    def __getattr__(self, name):
        target = getattr(self._ev, name)
        if not callable(target):
            return target

        def wrapped(*args, **kwargs):
            t0 = time.time()
            out = target(*args, **kwargs)
            OpProfiler._force(out)
            self.times[name] += time.time() - t0
            self.calls[name] += 1
            return out

        return wrapped

    def reset(self):
        self.times.clear()
        self.calls.clear()

    def report(self) -> str:
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        total = sum(self.times.values()) or 1.0
        out = [f"{'op':<24}{'calls':>7}{'total_ms':>12}{'mean_ms':>10}{'%':>6}"]
        for name, t in rows:
            c = self.calls[name]
            out.append(
                f"{name:<24}{c:>7}{t * 1e3:>12.2f}{t * 1e3 / c:>10.2f}"
                f"{100 * t / total:>6.1f}"
            )
        return "\n".join(out)

    def as_dict(self) -> dict:
        return {
            name: {
                "calls": self.calls[name],
                "total_ms": round(t * 1e3, 3),
                "mean_ms": round(t * 1e3 / self.calls[name], 3),
            }
            for name, t in self.times.items()
        }


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profile of the enclosed region (TensorBoard format,
    per-kernel cost attribution). No-op-safe if the profiler is busy."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
