"""Segment timings for the grad-LML hot path on TPU.

Times each stage of the batched LML and its gradient (N=1024, P=64,
float32): Pallas assembly fwd/bwd, XLA batched Cholesky, triangular
solves, K^-1 formation, and the full value-and-grad program under both
the autodiff MVN logpdf and the closed-form custom VJP.

Usage: python scripts/bench_segments.py   (TPU; writes to stderr)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 1024
P = 64
WARM = 2
ITERS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    out = fn(*args)
    jax_block(out)
    log(f"{name}: compile+1st ok")
    for _ in range(WARM):
        out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax_block(out)
    dt = (time.time() - t0) / ITERS * 1e3
    log(f"{name}: {dt:.2f} ms")
    return dt


def jax_block(x):
    import jax
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


def main():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import GPConfig
    from autogp_tpu import gp_math
    from autogp_tpu import model as M
    from autogp_tpu.inference import smc
    from autogp_tpu.ops import cov_pallas, cov_pallas_vjp

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
    nt, pz, nz = particles.node_type, particles.params, particles.noise_z
    D = cfg.depth_cap

    @jax.jit
    def assemble(nt, pz, nz):
        pt = jax.vmap(lambda p: M.transform_params(nt[0], p, tables.ttable)
                      )(pz)
        noise = jax.vmap(lambda z: M.transform_noise(z, cfg))(nz)
        return cov_pallas.cov_matrix_batched(nt, pt, noise, data.ts,
                                             data.mask, D)

    Ks = assemble(nt, pz, nz)
    timed("assembly fwd (pallas)", assemble, nt, pz, nz)

    @jax.jit
    def assemble_tape(nt, pz, nz):
        def one(nt1, pz1, nz1):
            pt = M.transform_params(nt1, pz1, tables.ttable)
            noise = M.transform_noise(nz1, cfg)
            return cov_pallas.cov_matrix_tape(nt1, pt, noise, data.ts,
                                              data.mask, D)
        return jax.vmap(one)(nt, pz, nz)

    timed("assembly fwd (tape)", assemble_tape, nt, pz, nz)

    chol = jax.jit(jax.vmap(jnp.linalg.cholesky))
    Ls = chol(Ks)
    timed("cholesky (XLA batched)", chol, Ks)

    from autogp_tpu.ops import chol_pallas
    cholp = jax.jit(chol_pallas.cholesky_batched)
    Lp = cholp(Ks)
    # Prior-draw grams can be f32-indefinite: compare NaN sets (must be
    # identical particles) and the max diff over the non-NaN particles.
    nan_p = np.asarray(jnp.any(jnp.isnan(Lp), axis=(1, 2)))
    nan_x = np.asarray(jnp.any(jnp.isnan(Ls), axis=(1, 2)))
    ok = ~(nan_p | nan_x)
    err = float(jnp.max(jnp.abs(Lp[ok] - Ls[ok]))) if ok.any() else 0.0
    log(f"pallas chol max|diff| vs XLA: {err:.3e} on {int(ok.sum())}/{P} "
        f"finite particles; NaN-set match: {bool((nan_p == nan_x).all())} "
        f"({int(nan_p.sum())} pallas / {int(nan_x.sum())} xla)")
    timed("cholesky (pallas blocked)", cholp, Ks)

    solve1 = jax.jit(jax.vmap(
        lambda L: jax.scipy.linalg.solve_triangular(L, data.xs, lower=True)))
    timed("trisolve 1-rhs", solve1, Ls)

    eye = jnp.eye(N, dtype=dtype)
    kinv = jax.jit(jax.vmap(
        lambda L: jax.scipy.linalg.cho_solve((L, True), eye)))
    timed("K^-1 (cho_solve vs I)", kinv, Ls)

    trtri = jax.jit(jax.vmap(lambda L: gp_math.tri_inv_blocked(L)))
    Winv = trtri(Ls)
    timed("L^-1 (blocked trtri)", trtri, Ls)

    kinv2 = jax.jit(jax.vmap(
        lambda W: jnp.einsum("ji,jk->ik", W, W,
                             preferred_element_type=W.dtype)))
    timed("K^-1 = Linv^T Linv (matmul)", kinv2, Winv)

    # assembly bwd kernel alone
    @jax.jit
    def asm_grad(nt, pz, nz, kbar):
        def one(nt1, pz1, nz1, kb1):
            pt = M.transform_params(nt1, pz1, tables.ttable)
            noise = M.transform_noise(nz1, cfg)
            return cov_pallas_vjp._cov_grads(nt1, pt, kb1, data.ts,
                                             data.mask, D, True)
        return jax.vmap(one)(nt, pz, nz, kbar)

    timed("assembly bwd (pallas)", asm_grad, nt, pz, nz, Ks)

    @jax.jit
    def asm_grad_tape(nt, pz, nz, kbar):
        def one(nt1, pz1, nz1, kb1):
            pt = M.transform_params(nt1, pz1, tables.ttable)
            return cov_pallas_vjp._cov_grads_tape(nt1, pt, kb1, data.ts,
                                                  data.mask, D, True)
        return jax.vmap(one)(nt, pz, nz, kbar)

    timed("assembly bwd (tape)", asm_grad_tape, nt, pz, nz, Ks)

    # full grad-LML: custom VJP vs autodiff MVN
    def lml_path(use_cvjp):
        def one(nt1, pz1, nz1):
            pt = M.transform_params(nt1, pz1, tables.ttable)
            noise = M.transform_noise(nz1, cfg)
            K = cov_pallas_vjp.cov_matrix_diff(nt1, pt, noise, data.ts,
                                               data.mask, D)
            f = (gp_math.mvn_logpdf_masked_cvjp if use_cvjp
                 else gp_math.mvn_logpdf_masked)
            return f(K, data.xs, data.mask)

        def vg(nt1, pz1, nz1):
            return jax.value_and_grad(
                lambda p, z: one(nt1, p, z), argnums=(0, 1))(pz1, nz1)

        return jax.jit(jax.vmap(vg))

    t_auto = timed("grad-LML (autodiff mvn)", lml_path(False), nt, pz, nz)
    t_cvjp = timed("grad-LML (custom vjp)", lml_path(True), nt, pz, nz)
    log(f"speedup: {t_auto / t_cvjp:.2f}x")

    fwd = jax.jit(jax.vmap(lambda nt1, pz1, nz1: M.lml(
        nt1, pz1, nz1, data.ts, data.xs, data.mask, cfg, tables)))
    timed("LML fwd (pallas)", fwd, nt, pz, nz)

    ng = jax.jit(jax.vmap(lambda nt1, pz1, nz1: M.lml_value_and_noise_grad(
        nt1, pz1, nz1, data.ts, data.xs, data.mask, cfg, tables)))
    timed("LML + noise grad (analytic)", ng, nt, pz, nz)


if __name__ == "__main__":
    main()
