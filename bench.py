"""Benchmark: batched GP log-marginal-likelihood throughput on TPU.

Primary metric from BASELINE.json: LML evals/sec at N=1024 with 64 SMC
particles — the hot loop of every inference engine (covariance assembly
from tensor-encoded kernel trees + Cholesky + solve, vmapped across
particles).

`vs_baseline` compares against a measured single-host CPU reference
implementing the same per-particle computation the Julia package performs
(dense float64 covariance build + scipy Cholesky LML, one particle at a
time — AutoGP.jl's per-particle compute path is exactly this plus Julia
overheads; the repo publishes no numbers of its own, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 1024
P = 64
WARMUP = 3
# Deep enough to pipeline past the remote-relay dispatch latency
# (~3 ms/call at depth 10); 32 in-flight batches measure steady-state
# device throughput.
ITERS = 32


def tpu_throughput():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import GPConfig
    from autogp_tpu import model as M
    from autogp_tpu.inference import smc

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    dtype = jnp.float32
    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=dtype)
    particles = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                               dtype=dtype)
    log(f"devices: {jax.devices()}")

    @jax.jit
    def lml_all(node_type, params, noise_z):
        def one(nt, pz, nz):
            return M.lml(nt, pz, nz, data.ts, data.xs, data.mask, cfg,
                         tables)
        return jax.vmap(one)(node_type, params, noise_z)

    nz = particles.noise_z
    t0 = time.time()
    out = lml_all(particles.node_type, particles.params, nz)
    out.block_until_ready()
    log(f"tpu compile+first: {time.time() - t0:.1f}s")

    # Distinct inputs per iteration (defeats any result caching), built
    # OUTSIDE the timed loop: an eager device add inside it would add a
    # second relay dispatch per iteration that is not LML work.
    perturbed = [jax.block_until_ready(nz + 1e-6 * (i + 1))
                 for i in range(max(WARMUP, ITERS))]

    for i in range(WARMUP):
        out = lml_all(particles.node_type, particles.params, perturbed[i])
    out.block_until_ready()

    t0 = time.time()
    for i in range(ITERS):
        out = lml_all(particles.node_type, particles.params, perturbed[i])
    out.block_until_ready()
    dt = time.time() - t0
    evals_per_sec = P * ITERS / dt
    log(f"tpu: {ITERS} batched evals in {dt:.3f}s -> "
        f"{evals_per_sec:.1f} LML evals/s (batch of {P})")
    # Decode particles for the CPU baseline on identical kernels.
    return evals_per_sec, particles, cfg, ts, xs


def cpu_baseline(particles, cfg, ts, xs, n_evals=8):
    """Reference-equivalent per-particle float64 LML on host CPU."""
    from scipy.linalg import cho_factor, cho_solve
    from autogp_tpu import GP
    from autogp_tpu import model as M
    from autogp_tpu import tree as T

    kernels = []
    noises = []
    for i in range(min(n_evals, P)):
        k = T.tensor_to_node(np.asarray(particles.node_type[i]),
                             np.asarray(particles.params[i]), cfg)
        kernels.append(k)
        noises.append(float(M.transform_noise(
            float(particles.noise_z[i]), cfg)))

    t0 = time.time()
    for k, nv in zip(kernels, noises):
        K = GP.compute_cov_matrix_vectorized(k, nv, ts)
        c, lower = cho_factor(K, lower=True)
        alpha = cho_solve((c, lower), xs)
        _ = (-0.5 * (len(ts) * np.log(2 * np.pi)
                     + 2 * np.sum(np.log(np.diag(c)))
                     + xs @ alpha))
    dt = time.time() - t0
    eps = len(kernels) / dt
    log(f"cpu baseline: {len(kernels)} evals in {dt:.3f}s -> {eps:.2f}/s")
    return eps


def main():
    tpu_eps, particles, cfg, ts, xs = tpu_throughput()
    cpu_eps = cpu_baseline(particles, cfg, ts, xs)
    print(json.dumps({
        "metric": f"LML evals/sec (N={N}, {P} particles)",
        "value": round(tpu_eps, 2),
        "unit": "evals/s",
        "vs_baseline": round(tpu_eps / cpu_eps, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
