"""Streaming (add_data-driven) benchmark — config-5 shape (BASELINE.md).

Measures the per-step cost of the online workflow AFTER warmup:
    add_data(1 point) -> maybe_resample -> predict(next point)
at N~512, P=128. The mutation paths are content-key cached
(api._reweight_current / smc.maybe_resample_jit / _posterior_summary_jit),
so steps after the first in a padding bucket must be compile-free; the
script asserts zero new traces across the timed window and prints the
mean per-step wall time.

Usage: python scripts/bench_streaming.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import autogp_tpu
    from autogp_tpu import api
    from autogp_tpu.config import GPConfig
    from autogp_tpu.inference import smc

    P = int(os.environ.get("P", 128))
    n0 = int(os.environ.get("N0", 480))
    n_steps = int(os.environ.get("STEPS", 20))

    rng = np.random.default_rng(0)
    n_total = n0 + n_steps + 1
    ts = np.linspace(0.0, 1.0, n_total)
    xs = np.sin(2 * np.pi * 9 * ts) + 0.1 * rng.standard_normal(n_total)

    autogp_tpu.seed(0)
    cfg = GPConfig(max_depth=5)
    log(f"constructing GPModel P={P} n0={n0} (bucket "
        f"{smc.bucket_size(n0)})")
    t0 = time.time()
    m = autogp_tpu.GPModel(ts[:n0], xs[:n0], n_particles=P, config=cfg)
    jax.block_until_ready(m.particles)
    log(f"init: {time.time() - t0:.1f}s")

    def step(i):
        autogp_tpu.add_data(m, ts[n0 + i:n0 + i + 1],
                            xs[n0 + i:n0 + i + 1])
        api.maybe_resample(m, P / 2)
        pred = autogp_tpu.predict(m, ts[n0 + i + 1:n0 + i + 2],
                                  quantiles=[0.025, 0.975])
        return pred

    # Warmup: first step compiles the bucket's programs.
    t0 = time.time()
    step(0)
    warm = time.time() - t0
    log(f"step 1 (compiles): {warm:.2f}s")

    rw = api._reweight_cache[m.config.cache_key]
    traces0 = (rw._cache_size(), smc.maybe_resample_jit._cache_size())
    t0 = time.time()
    for i in range(1, n_steps):
        step(i)
    per = (time.time() - t0) / (n_steps - 1)
    traces1 = (rw._cache_size(), smc.maybe_resample_jit._cache_size())
    assert traces1 == traces0, f"re-traced: {traces0} -> {traces1}"
    log(f"steady-state streaming step (add_data + maybe_resample + "
        f"predict): {per * 1e3:.1f} ms  [zero new traces]")
    print('{"metric": "streaming step (N=%d, P=%d)", "value": %.1f, '
          '"unit": "ms"}' % (n0, P, per * 1e3))


if __name__ == "__main__":
    main()
