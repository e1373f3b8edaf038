"""Device-loop timing: grad-LML fused Kbar VJP vs unfused chain (TPU).

Usage: python scripts/bench_fused_grad.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import GPConfig
    from autogp_tpu import gp_math
    from autogp_tpu import model as M
    from autogp_tpu.inference import smc
    from autogp_tpu.ops import cov_pallas_vjp
    from scripts.tpu_timer import device_time

    N, P = 1024, 64
    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    parts = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                           dtype=jnp.float32)

    def make(fused):
        def g_one(eps, pz, nz, nt):
            def f(pz, nz):
                pt = M.transform_params(nt, pz + eps, tables.ttable)
                noise = M.transform_noise(nz, cfg)
                if fused:
                    return cov_pallas_vjp.lml_tape_fused(
                        nt, pt, noise, data.ts, data.xs, data.mask,
                        cfg.depth_cap)
                K = cov_pallas_vjp.cov_matrix_diff(
                    nt, pt, noise, data.ts, data.mask, cfg.depth_cap)
                return gp_math.mvn_logpdf_masked_cvjp(K, data.xs,
                                                      data.mask, True)
            return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)

        def batch(eps):
            return jax.vmap(lambda pz, nz, nt: g_one(eps, pz, nz, nt))(
                parts.params, parts.noise_z, parts.node_type)
        return batch

    for fused in (False, True):
        fn = make(fused)
        dt = device_time(lambda eps: fn(eps))
        log(f"grad-LML {'fused' if fused else 'unfused'}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
