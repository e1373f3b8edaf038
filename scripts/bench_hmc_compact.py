"""A/B the bucketed-HMC compaction on one SMC round (N=1024, P=64).

HMC rejuvenation only runs on MH-accepted particles (~25% acceptance on
this workload), so the full-width batched while_loop wastes ~4x of the
dominant leapfrog cost on masked lanes. `hmc_compact=True` gathers the
enabled particles to the front and scans over P/4-wide chunks (one
compiled HMC instantiation; trailing all-disabled chunks exit their
while_loop immediately). Results are bit-identical
(tests/test_inference.py); this script measures the wall-clock effect
warm.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import model as M
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import smc

N, P, N_MCMC, N_HMC = 1024, 64, 10, 10

cfg = GPConfig(max_depth=5)
tables = M.prior_tables(cfg)
rng = np.random.default_rng(0)
ts = np.linspace(0.0, 1.0, N)
xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
parts = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                       dtype=jnp.float32)
hc = hmc_mod.HMCConfig(n_exit=1)

for compact in (False, True):
    fn = smc.smc_round_jit(cfg, tables, n_mcmc=N_MCMC, n_hmc=N_HMC,
                           biased=False, hmc_cfg=hc, infer_noise=True,
                           allow_resample=True, ess_threshold=P / 2,
                           adaptive_rejuvenation=False,
                           hmc_compact=compact)
    t0 = time.time()
    out, stats = fn(jax.random.PRNGKey(1), parts, data)
    jax.block_until_ready(out.log_weights)
    t_cold = time.time() - t0
    times = []
    for rep in range(3):
        t0 = time.time()
        out, stats = fn(jax.random.PRNGKey(2 + rep), parts, data)
        jax.block_until_ready(out.log_weights)
        times.append(time.time() - t0)
    acc = int(np.asarray(stats["mh_accepted"]).sum())
    sw = int(np.asarray(stats["hmc_sweeps"]).sum())
    print(f"compact={compact}: cold {t_cold:.1f}s, warm best "
          f"{min(times):.3f}s (all {[f'{t:.3f}' for t in times]}), "
          f"accepts={acc} sweeps={sw}")
