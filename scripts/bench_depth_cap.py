"""Price the depth cap (VERDICT r3 next #7).

The reference's default prior is unbounded (GP.jl:1119, max_depth=-1);
the tensor-trace encoding truncates at static_max_depth (default 5 = 31
heap slots, clipping ~6.1% of default prior mass — config.py:121-135,
tests/test_config.py). This script measures what raising the cap to 6
(63 slots, ~2.9% clipped) or 7 (127 slots, ~1.4% clipped) actually
costs, so users can make the trade the docs tell them to make:

  - SMC-round program size (StableHLO lines) and trace+lower time,
    measured by lowering the full smc_round program on CPU at the
    BENCH.md §"program size" shape (n=16/pad 32, P=16, n_mcmc=2,
    n_hmc=2, L=3);
  - with AUTOGP_DEPTH_TPU=1: TPU compile time and device runtime of the
    flagship LML batch (N=1024, P=64) and of one SMC round at the same
    small shape, per depth.

Results land in BENCH.md's "Pricing the depth cap" table.

Usage:
  python scripts/bench_depth_cap.py            # CPU lowering metrics
  AUTOGP_DEPTH_TPU=1 python scripts/bench_depth_cap.py   # + TPU timings
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TPU = os.environ.get("AUTOGP_DEPTH_TPU") == "1"
DEPTHS = [int(d) for d in
          os.environ.get("AUTOGP_DEPTHS", "5,6,7").split(",")]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if not TPU:
        jax.config.update("jax_platforms", "cpu")
        from autogp_tpu.utils.jax_cache import cpu_cache_dir
        jax.config.update("jax_compilation_cache_dir",
                          cpu_cache_dir(os.path.join(REPO, ".jax_cache")))
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp
    import numpy as np
    from autogp_tpu import config as C
    from autogp_tpu import model as M
    from autogp_tpu.inference import hmc as hmc_mod
    from autogp_tpu.inference import smc

    dtype = jnp.float32 if TPU else None
    rng = np.random.default_rng(0)
    n = 16
    ts = np.linspace(0.0, 1.0, n)
    xs = np.sin(2 * np.pi * 3 * ts) + 0.1 * rng.standard_normal(n)
    data = smc.make_dataset(ts, xs, pad_to=32, dtype=dtype)
    hc = hmc_mod.HMCConfig(L_param=3, L_noise=3, n_exit=1)

    rows = []
    for depth in DEPTHS:
        cfg = C.GPConfig(max_depth=depth)
        tables = M.prior_tables(cfg)
        parts = smc.initialize(jax.random.PRNGKey(0), 16, data, cfg,
                               tables, dtype=dtype)

        def round_fn(key, particles, d):
            return smc.smc_round(key, particles, d, cfg, tables,
                                 n_mcmc=2, n_hmc=2, biased=False,
                                 hmc_cfg=hc, infer_noise=True,
                                 allow_resample=True, ess_threshold=8.0,
                                 adaptive_rejuvenation=False)

        t0 = time.perf_counter()
        lowered = jax.jit(round_fn).lower(jax.random.PRNGKey(1), parts,
                                          data)
        t_lower = time.perf_counter() - t0
        hlo_lines = lowered.as_text().count("\n")
        row = {"depth": depth, "slots": cfg.max_nodes,
               "hlo_lines": hlo_lines, "lower_s": round(t_lower, 2)}

        # XLA compile of the round program: on TPU this runs on the remote
        # relay; on the 1-core CPU host it takes ~11 min at depth 5 alone
        # (BENCH.md), so gate it behind AUTOGP_DEPTH_COMPILE=1 there.
        compiled = None
        if TPU or os.environ.get("AUTOGP_DEPTH_COMPILE") == "1":
            t0 = time.perf_counter()
            compiled = lowered.compile()
            row["compile_s"] = round(time.perf_counter() - t0, 1)

        if TPU:
            from scripts.tpu_timer import device_time
            # Flagship LML batch at this depth.
            N, P = 1024, 64
            rng2 = np.random.default_rng(1)
            ts2 = np.linspace(0.0, 1.0, N)
            xs2 = np.sin(2 * np.pi * 7 * ts2) \
                + 0.1 * rng2.standard_normal(N)
            data2 = smc.make_dataset(ts2, xs2, pad_to=N, dtype=dtype)
            parts2 = smc.initialize(jax.random.PRNGKey(0), P, data2, cfg,
                                    tables, dtype=dtype)

            @jax.jit
            def lml_all(nz_shift):
                def one(nt, pz, nz):
                    return M.lml(nt, pz, nz + nz_shift, data2.ts, data2.xs,
                                 data2.mask, cfg, tables)
                return jnp.sum(jax.vmap(one)(parts2.node_type,
                                             parts2.params,
                                             parts2.noise_z))

            t0 = time.perf_counter()
            float(lml_all(jnp.asarray(0.0, dtype)))
            row["lml_compile_first_s"] = round(time.perf_counter() - t0, 1)
            row["lml_batch_ms"] = round(
                device_time(lambda eps: lml_all(eps)) * 1e3, 2)

            # One SMC round at the small shape (runtime, not compile).
            out = compiled(jax.random.PRNGKey(1), parts, data)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = compiled(jax.random.PRNGKey(2), parts, data)
            jax.block_until_ready(out)
            row["round_wall_s"] = round(time.perf_counter() - t0, 3)
        rows.append(row)
        log(row)

    import json
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
