"""Pin the CPU reference-equivalent denominator for bench.py.

The vs-CPU multiplier in BENCH_r0*.json historically rested on a single
CPU draw per bench run, and that draw spanned 8.96-19.0 evals/s across
rounds (~2x) — making the headline "x" figure noise. This script
measures the SAME workload bench.py uses (first 8 particles of the
seed-0, P=64, N=1024 ensemble; dense float64 covariance build + scipy
Cholesky LML per particle, one at a time — the Julia reference's
per-particle compute path) over >=5 timing draws and writes the median
to BASELINE_MEASURED.json. bench.py reads that file for `vs_baseline`.

Regenerate explicitly (not per bench run):
    python scripts/measure_cpu_baseline.py
"""

import json
import os
import platform
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 1024
P = 64
N_EVALS = 8
N_DRAWS = 7


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from scipy.linalg import cho_factor, cho_solve
    from autogp_tpu import GP, GPConfig
    from autogp_tpu import model as M
    from autogp_tpu import tree as T
    from autogp_tpu.inference import smc

    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    particles = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                               dtype=jnp.float32)

    kernels, noises = [], []
    for i in range(N_EVALS):
        k = T.tensor_to_node(np.asarray(particles.node_type[i]),
                             np.asarray(particles.params[i]), cfg)
        kernels.append(k)
        noises.append(float(M.transform_noise(
            float(particles.noise_z[i]), cfg)))

    def one_draw():
        t0 = time.perf_counter()
        for k, nv in zip(kernels, noises):
            K = GP.compute_cov_matrix_vectorized(k, nv, ts)
            c, lower = cho_factor(K, lower=True)
            alpha = cho_solve((c, lower), xs)
            _ = (-0.5 * (len(ts) * np.log(2 * np.pi)
                         + 2 * np.sum(np.log(np.diag(c)))
                         + xs @ alpha))
        return N_EVALS / (time.perf_counter() - t0)

    one_draw()  # warm numpy/scipy
    draws = [one_draw() for _ in range(N_DRAWS)]
    med = float(np.median(draws))
    out = {
        "metric": "CPU reference-equivalent LML evals/sec "
                  f"(N={N}, first {N_EVALS} of the seed-0 P={P} ensemble, "
                  "float64 dense cov + scipy Cholesky, one particle at a time)",
        "cpu_lml_evals_per_sec_median": round(med, 3),
        "draws": [round(d, 3) for d in draws],
        "n_draws": N_DRAWS,
        "host": platform.processor() or platform.machine(),
        "tree_sizes": [k.size for k in kernels],
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
