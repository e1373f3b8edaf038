"""Device-side-loop timing for the remote-relay TPU backend.

Single-call timings through the axon relay are dominated by the
host<->relay round trip (~20-40 ms), and `block_until_ready` on large
device buffers can return before execution completes (deferred
materialization) — both make naive `perf_counter` loops meaningless.

`device_time(f, *args)` compiles `lax.fori_loop(0, iters, body)` where
body calls `f` with an iteration-dependent perturbation and folds the
output into a scalar accumulator (so iterations chain and nothing is
dedupable), forces the scalar to host, and returns
    (t(iters_hi) - t(iters_lo)) / (iters_hi - iters_lo)
which cancels the fixed relay round trip exactly.

Usage: f must accept (eps, *args) where eps is a traced f32 scalar the
caller mixes into its inputs, and return any pytree of arrays.
"""

import time

import jax
import jax.numpy as jnp


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x).astype(jnp.float32) for x in leaves)


def device_time(f, *args, iters_lo=5, iters_hi=15, reps=3):
    """Best-of-reps per-iteration seconds of `f(eps, *args)` on device.

    For microsecond-scale programs the (iters_hi - iters_lo) span cannot
    resolve the per-iteration cost above the ~ms relay jitter — in the
    worst case the difference goes NEGATIVE (observed on the cached-
    factor predict program, BENCH config 1a). When the measured delta is
    below 4x the jitter floor, escalate both loop lengths (tiny program
    => recompiling the longer scans is cheap) until resolved."""

    def measure(lo, hi):
        def looped(n_static):
            @jax.jit
            def run(*a):
                def body(i, acc):
                    out = f(acc * 0.0 + 1e-6 * i, *a)
                    return acc + _scalarize(out)
                return jax.lax.fori_loop(0, n_static, body,
                                         jnp.float32(0.0))
            return run

        f_lo = looped(lo)
        f_hi = looped(hi)
        float(f_lo(*args))  # compile
        float(f_hi(*args))

        def t(fn):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(f_hi) - t(f_lo)) / (hi - lo)

    lo, hi = iters_lo, iters_hi
    while True:
        dt = measure(lo, hi)
        # ~2 ms of unmodeled host/relay jitter across the two timings.
        if dt >= 4 * 2e-3 / (hi - lo) or hi >= 4000:
            return dt
        lo, hi = lo * 8, hi * 8
