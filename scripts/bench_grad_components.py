"""Device-loop timing of every stage of the fused grad-LML path (TPU).

Round-5 profile feeding the chol->kinv fusion decision (VERDICT r4 #3):
times the flagship [P=64, N=1024] batch stage by stage —
assembly fwd, blocked Cholesky (+fused solve), linv_beta substitution,
the tape backward with in-tape K^-1 tiles, and the end-to-end
value / value+grad programs.

Usage: python scripts/bench_grad_components.py
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
    from autogp_tpu.ops import chol_pallas, cov_pallas, cov_pallas_vjp, \
        kinv_pallas
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
    dc = cfg.depth_cap

    def pt_of(parts, eps=0.0):
        return jax.vmap(lambda pz, nt: M.transform_params(
            nt, pz + eps, tables.ttable))(parts.params, parts.node_type)

    noise = jax.vmap(lambda nz: M.transform_noise(nz, cfg))(parts.noise_z)

    # Pre-stage K, L, alpha, V, beta for the stage-wise timings.
    @jax.jit
    def stage():
        pt = pt_of(parts)
        K = jax.vmap(lambda nt, p, nz: cov_pallas.cov_matrix_tape(
            nt, p, nz, data.ts, data.mask, dc, lower_only=True))(
                parts.node_type, pt, noise)
        L, alpha = jax.vmap(chol_pallas.chol_solve_psd)(
            K, jnp.broadcast_to(data.xs * data.mask, (P, N)))
        V, beta, fro = jax.vmap(kinv_pallas.linv_beta)(L, alpha)
        return pt, K, L, alpha, V, beta
    pt, K, L, alpha, V, beta = jax.block_until_ready(stage())

    # --- stage-wise -----------------------------------------------------
    def t_asm(eps):
        p2 = pt_of(parts, eps)
        return jax.vmap(lambda nt, p, nz: cov_pallas.cov_matrix_tape(
            nt, p, nz, data.ts, data.mask, dc, lower_only=True))(
                parts.node_type, p2, noise)

    def t_chol(eps, K):
        return jax.vmap(chol_pallas.chol_psd)(K + eps * jnp.eye(N))

    def t_chol_solve(eps, K):
        return jax.vmap(chol_pallas.chol_solve_psd)(
            K + eps * jnp.eye(N), jnp.broadcast_to(data.xs * data.mask,
                                                   (P, N)))

    def t_linv_beta(eps, L, alpha):
        return jax.vmap(kinv_pallas.linv_beta)(L + eps * jnp.eye(N), alpha)

    def t_linv_nostats(eps, L, alpha):
        # substitution only (want_stats=False profiling variant)
        return kinv_pallas._launch(L + eps * jnp.eye(N), alpha,
                                   want_kinv=False, want_v=True,
                                   want_stats=False)

    def t_tape_bwd(eps, V, beta):
        return jax.vmap(
            lambda nt, p, v, b: cov_pallas_vjp._cov_grads_tape(
                nt, p, v, data.ts, data.mask, dc, masked=True,
                beta=b, gscale=1.0, sym=True, linv=True))(
                    parts.node_type, pt + eps, V, beta)

    # --- end-to-end -----------------------------------------------------
    def lml_value(eps):
        def one(pz, nz, nt):
            p = M.transform_params(nt, pz + eps, tables.ttable)
            nzv = M.transform_noise(nz, cfg)
            return cov_pallas_vjp.lml_tape_fused(
                nt, p, nzv, data.ts, data.xs, data.mask, dc)
        return jax.vmap(one)(parts.params, parts.noise_z, parts.node_type)

    def grad_lml(eps):
        def one(pz, nz, nt):
            def f(pz, nz):
                p = M.transform_params(nt, pz + eps, tables.ttable)
                nzv = M.transform_noise(nz, cfg)
                return cov_pallas_vjp.lml_tape_fused(
                    nt, p, nzv, data.ts, data.xs, data.mask, dc)
            return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)
        return jax.vmap(one)(parts.params, parts.noise_z, parts.node_type)

    rows = [
        ("assembly fwd (lower_only)", t_asm, ()),
        ("chol (no solve)", t_chol, (K,)),
        ("chol + fused solve", t_chol_solve, (K,)),
        ("linv_beta (sub+stats)", t_linv_beta, (L, alpha)),
        ("linv substitution only", t_linv_nostats, (L, alpha)),
        ("tape bwd (in-tape kinv)", t_tape_bwd, (V, beta)),
        ("LML value e2e", lml_value, ()),
        ("grad-LML e2e", grad_lml, ()),
    ]
    for name, f, args in rows:
        dt = device_time(f, *args)
        log(f"{name:28s}: {dt*1e3:7.2f} ms  [P={P}, N={N}]")


if __name__ == "__main__":
    main()
