"""A/B the two lml_tape_fused backward backends on the TPU.

INTAPE_LINV=False: K^-1 formed lower-only in the kinv kernel, tape
kernel streams its tiles. INTAPE_LINV=True: in-tape K^-1 tiles off two
L^-1 column strips. Both modes share the identical forward.

Usage: python scripts/bench_grad_ab.py
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
    from autogp_tpu import model as M
    from autogp_tpu.inference import smc
    from autogp_tpu.ops import cov_pallas_vjp
    from scripts.tpu_timer import device_time

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    log(f"devices: {jax.devices()}")

    N, P = 1024, 64
    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    parts = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                           dtype=jnp.float32)

    def grad_batch(eps):
        def one(pz, nz, nt):
            def f(pz, nz):
                p = M.transform_params(nt, pz + eps, tables.ttable)
                nzv = M.transform_noise(nz, cfg)
                return cov_pallas_vjp.lml_tape_fused(
                    nt, p, nzv, data.ts, data.xs, data.mask,
                    cfg.depth_cap)
            return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)
        return jax.vmap(one)(parts.params, parts.noise_z, parts.node_type)

    outs = {}
    for mode in (False, True):
        cov_pallas_vjp.INTAPE_LINV = mode
        dt = device_time(grad_batch)
        name = "linv-in-tape" if mode else "kinv-kernel"
        log(f"grad-LML [{name}]: {dt*1e3:6.2f} ms "
            f"({P/dt:.0f} grad evals/s)")
        (v, (gp, gn)) = jax.jit(grad_batch)(jnp.float32(0.0))
        outs[mode] = (np.asarray(v), np.asarray(gp), np.asarray(gn))
    va, gpa, gna = outs[False]
    vb, gpb, gnb = outs[True]
    log(f"value max|diff|: {np.abs(va - vb).max():.3e} (must be 0: "
        "identical forward)")
    gs = np.abs(gpa).max()
    log(f"param-grad max rel diff: {np.abs(gpa - gpb).max() / gs:.3e}; "
        f"noise-grad: {np.abs(gna - gnb).max() / np.abs(gna).max():.3e}")


if __name__ == "__main__":
    main()
