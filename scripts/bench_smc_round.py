"""Wall-clock of one full SMC round on TPU (reweight + adaptive resample +
involutive-MCMC/HMC rejuvenation), N=1024 / P=64 / n_mcmc=2 / n_hmc=2 —
the config recorded in BENCH.md's progression.

Usage: python scripts/bench_smc_round.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from autogp_tpu import GPConfig
    from autogp_tpu import model as M
    from autogp_tpu.inference import hmc as hmc_mod
    from autogp_tpu.inference import smc

    import jax.numpy as jnp
    dtype = jnp.float32
    N, P = 1024, 64
    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=dtype)
    particles = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                               dtype=dtype)
    print("devices:", jax.devices(), file=sys.stderr)

    hc = hmc_mod.HMCConfig(n_exit=1)
    fn = smc.smc_round_jit(cfg, tables, n_mcmc=2, n_hmc=2, biased=False,
                           hmc_cfg=hc, infer_noise=True,
                           allow_resample=True, ess_threshold=P / 2,
                           adaptive_rejuvenation=False)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    out, stats = fn(key, particles, data)
    jax.block_until_ready(out)
    print(f"compile+1st: {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for i in range(3):
        t0 = time.time()
        out, stats = fn(jax.random.fold_in(key, i), particles, data)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    print(f"SMC round (N={N}, P={P}, n_mcmc=2, n_hmc=2): "
          f"{min(times):.2f}s best of {len(times)} "
          f"(all: {[round(t, 2) for t in times]})")


if __name__ == "__main__":
    main()
