"""Real-hardware kernel parity tests (skipped off-TPU).

The CPU suite exercises the Pallas kernels in interpret mode; these run
the compiled Mosaic kernels on the actual TPU and check them against
float64 ground truth. Run with:

    AUTOGP_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("TPU kernels need real hardware (AUTOGP_TEST_TPU=1)",
                allow_module_level=True)

from autogp_tpu import GPConfig
from autogp_tpu import gp_math
from autogp_tpu import model as M
from autogp_tpu.inference import smc
from autogp_tpu.ops import chol_pallas, cov_pallas


@pytest.fixture(scope="module")
def spd_batch():
    rng = np.random.default_rng(0)
    P, N = 8, 256
    A = rng.standard_normal((P, N, N))
    K64 = A @ np.swapaxes(A, 1, 2) + N * np.eye(N)
    return K64, jnp.asarray(K64, jnp.float32)


def test_chol_pallas_vs_f64(spd_batch):
    K64, K = spd_batch
    L64 = np.linalg.cholesky(K64)
    L = np.asarray(jax.jit(chol_pallas.cholesky_batched)(K), np.float64)
    scale = np.abs(L64).max()
    assert np.max(np.abs(L - L64)) / scale < 5e-6
    assert np.allclose(np.triu(L, 1), 0.0)


def test_chol_pallas_nan_parity_with_xla(spd_batch):
    """On non-PD f32 inputs the Pallas chol must NaN exactly where XLA's
    does (SMC treats NaN LML as a rejected/dead particle)."""
    _, K = spd_batch
    Kbad = K.at[0].add(-300.0 * jnp.eye(K.shape[1], dtype=K.dtype))
    Lx = np.asarray(jax.jit(jax.vmap(jnp.linalg.cholesky))(Kbad))
    Lp = np.asarray(jax.jit(chol_pallas.cholesky_batched)(Kbad))
    nx = np.isnan(Lx).any(axis=(1, 2))
    npal = np.isnan(Lp).any(axis=(1, 2))
    np.testing.assert_array_equal(nx, npal)


def test_chol_solve_fused_vs_f64(spd_batch):
    """Fused factor+solve (cholesky_solve_batched) vs float64 scipy."""
    from scipy.linalg import solve_triangular
    K64, K = spd_batch
    rng = np.random.default_rng(3)
    x64 = rng.standard_normal(K64.shape[:2])
    L, alpha = jax.jit(chol_pallas.cholesky_solve_batched)(
        K, jnp.asarray(x64, jnp.float32))
    L64 = np.linalg.cholesky(K64)
    a64 = np.stack([solve_triangular(L64[i], x64[i], lower=True)
                    for i in range(len(x64))])
    scale = np.abs(a64).max()
    assert np.max(np.abs(np.asarray(alpha, np.float64) - a64)) / scale \
        < 5e-6
    assert np.max(np.abs(np.asarray(L, np.float64) - L64)) \
        / np.abs(L64).max() < 5e-6


def test_tri_inv_blocked_vs_f64(spd_batch):
    K64, K = spd_batch
    L64 = np.linalg.cholesky(K64)
    L = jnp.asarray(L64, jnp.float32)
    W = np.asarray(jax.jit(jax.vmap(gp_math.tri_inv_blocked))(L),
                   np.float64)
    resid = np.max(np.abs(W @ L64 - np.eye(L64.shape[-1])))
    assert resid < 1e-5, resid


def test_assembly_tape_vs_cpu_f64():
    """Compiled tape assembly vs the float64 symbolic evaluator."""
    from autogp_tpu import GP
    from autogp_tpu import tree as T
    cfg = GPConfig(max_depth=4)
    tables = M.prior_tables(cfg)
    node = GP.ChangePoint(GP.Linear(0.3) * GP.Periodic(1.0, 0.5),
                          GP.GammaExponential(1.0, 1.2), 0.5, 0.001)
    nt, pz = T.node_to_tensor(node, cfg)
    nt = jnp.asarray(nt)
    pt = M.transform_params(nt, jnp.asarray(pz, jnp.float32),
                            tables.ttable)
    N = 256
    ts = np.linspace(0.0, 1.0, N)
    mask = jnp.ones(N, jnp.float32)
    Kp = np.asarray(jax.jit(
        lambda: cov_pallas.cov_matrix_tape(nt, pt, 0.3, jnp.asarray(
            ts, jnp.float32), mask, cfg.depth_cap))(), np.float64)
    node_t = T.tensor_to_node(np.asarray(nt), np.asarray(pz), cfg)
    K64 = GP.compute_cov_matrix_vectorized(node_t, 0.3, ts)
    # f32 kernel vs f64 symbolic: sigmoid/exp chains accumulate ~2e-5 abs
    # on O(1) entries.
    assert np.max(np.abs(Kp - K64)) < 5e-5


def test_grad_lml_tpu_vs_cpu_reference():
    """value_and_grad of the full Pallas LML path vs f64 finite check:
    the gradient must point uphill (directional derivative test)."""
    cfg = GPConfig(max_depth=4)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(1)
    N = 256
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 3 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    parts = smc.initialize(jax.random.PRNGKey(0), 4, data, cfg, tables,
                           dtype=jnp.float32)

    def lml_one(pz, nz, nt):
        return M.lml(nt, pz, nz, data.ts, data.xs, data.mask, cfg, tables)

    vg = jax.jit(jax.vmap(jax.value_and_grad(lml_one, argnums=(0, 1)),
                          in_axes=(0, 0, 0)))
    (v0, (gp, gn)) = vg(parts.params, parts.noise_z, parts.node_type)
    assert np.isfinite(np.asarray(v0)).all()
    # step along the gradient; LML must increase for a small step.
    eps = 1e-3
    gnorm = jnp.sqrt(jnp.sum(gp * gp, axis=(1, 2)) + gn * gn)[:, None, None]
    p2 = parts.params + eps * gp / jnp.maximum(gnorm, 1e-9)
    n2 = parts.noise_z + eps * (gn / jnp.maximum(gnorm[:, 0, 0], 1e-9))
    v1, _ = vg(p2, n2, parts.node_type)
    v0n, v1n = np.asarray(v0), np.asarray(v1)
    # Ill-conditioned prior draws can NaN after the step (f32 PD cliff);
    # every particle that survives must have moved uphill.
    ok = np.isfinite(v1n)
    assert ok.sum() >= len(v0n) // 2, (v0n, v1n)
    assert (v1n[ok] >= v0n[ok] - 1e-3).all(), (v0n, v1n)


def test_lml_fused_vjp_matches_unfused_tpu():
    """lml_tape_fused grads vs the unfused cov_matrix_diff + MVN-cvjp
    chain on hardware, both judged against pinned f64 truth.

    The two backwards are DIFFERENT f32 algorithms (fused: Pallas
    kinv_beta at in-kernel bf16x3; unfused: XLA blocked chain at
    GRAD_PRECISION — the same 3-pass class, different split points): on
    ill-conditioned prior draws each deviates from
    the f64 gradient by far more than any fixed path-vs-path tolerance
    (measured: a PD-cliff particle puts BOTH at ~2e-1 relative error vs
    f64). So accuracy is asserted per particle against the f64 golden
    (scripts/gen_golden_grad.py, CPU evaluator — itself mpmath-pinned by
    tests/test_golden.py): the fused path must not be meaningfully less
    accurate than the chain it replaced."""
    import os

    from autogp_tpu.ops import cov_pallas_vjp

    cfg = GPConfig(max_depth=4)
    tables = M.prior_tables(cfg)
    z = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "vjp_grad_f64.npz"))
    N = len(z["ts"])
    data = smc.make_dataset(z["ts"], z["xs"], pad_to=N, dtype=jnp.float32)
    nt = jnp.asarray(z["node_type"])
    pz = jnp.asarray(z["params"], jnp.float32)
    nz = jnp.asarray(z["noise_z"], jnp.float32)

    def g_fused(pz, nz, nt):
        def f(pz, nz):
            pt = M.transform_params(nt, pz, tables.ttable)
            noise = M.transform_noise(nz, cfg)
            return cov_pallas_vjp.lml_tape_fused(
                nt, pt, noise, data.ts, data.xs, data.mask, cfg.depth_cap)
        return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)

    def g_unfused(pz, nz, nt):
        def f(pz, nz):
            pt = M.transform_params(nt, pz, tables.ttable)
            noise = M.transform_noise(nz, cfg)
            K = cov_pallas_vjp.cov_matrix_diff(nt, pt, noise, data.ts,
                                               data.mask, cfg.depth_cap)
            return gp_math.mvn_logpdf_masked_cvjp(K, data.xs, data.mask,
                                                  True)
        return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)

    vf, (gpf, gnf) = jax.jit(jax.vmap(g_fused))(pz, nz, nt)
    vu, (gpu, gnu) = jax.jit(jax.vmap(g_unfused))(pz, nz, nt)
    vf, vu = np.asarray(vf, np.float64), np.asarray(vu, np.float64)
    ok = np.isfinite(vf) & np.isfinite(vu)
    assert ok.sum() >= len(vf) // 2
    np.testing.assert_allclose(vf[ok], vu[ok], rtol=1e-6)
    # value vs f64 truth: O(N)-scaled f32 bound (logdet/quad ~ 1e2);
    # rtol covers the ill-conditioned draws' amplified logdet error
    # (measured 1.3e-4 rel on the PD-cliff particle).
    np.testing.assert_allclose(vf[ok], z["v64"][ok], rtol=5e-4,
                               atol=1e-4 * N)
    # Ill-conditioned f32 prior draws can NaN in the GRADIENT even when
    # the value is finite (PD cliff); both paths must NaN on the same
    # particles.
    gpf, gpu = np.asarray(gpf, np.float64), np.asarray(gpu, np.float64)
    gnf, gnu = np.asarray(gnf, np.float64), np.asarray(gnu, np.float64)
    gok = (ok & np.isfinite(gpf).all(axis=(1, 2))
           & np.isfinite(gpu).all(axis=(1, 2))
           & np.isfinite(gnf) & np.isfinite(gnu))
    assert gok.sum() >= len(vf) // 2
    np.testing.assert_array_equal(
        np.isfinite(gpf[ok]).all(axis=(1, 2)),
        np.isfinite(gpu[ok]).all(axis=(1, 2)))
    gp64, gn64 = z["gp64"], z["gn64"]
    for i in np.where(gok)[0]:
        s = np.abs(gp64[i]).max() + 1e-9
        ef = np.abs(gpf[i] - gp64[i]).max() / s
        eu = np.abs(gpu[i] - gp64[i]).max() / s
        # no meaningful accuracy regression vs the replaced chain
        assert ef <= 3.0 * eu + 1e-6, (i, ef, eu)
        # well-conditioned particles must be accurate in absolute terms
        if eu < 1e-4:
            assert ef < 5e-4, (i, ef, eu)
        sn = abs(gn64[i]) + 1e-9
        efn = abs(gnf[i] - gn64[i]) / sn
        eun = abs(gnu[i] - gn64[i]) / sn
        assert efn <= 3.0 * eun + 1e-5, (i, efn, eun)


def test_kinv_beta_fused_vs_chain_and_f64(spd_batch):
    """The fused VMEM-resident K^-1/beta kernel (ops/kinv_pallas.py) vs
    the XLA blocked chain and float64 ground truth."""
    from autogp_tpu.ops import kinv_pallas

    K64, K = spd_batch
    rng = np.random.default_rng(5)
    L64 = np.linalg.cholesky(K64)
    L = jnp.asarray(L64, jnp.float32)
    x = jnp.asarray(rng.standard_normal(K64.shape[:2]), jnp.float32)

    kf, bf, ff = jax.jit(
        lambda L, x: jax.vmap(kinv_pallas.kinv_beta)(L, x))(L, x)
    kc, bc, fc = jax.jit(jax.vmap(kinv_pallas._chain_one))(L, x)
    kf, bf, ff, kc, bc, fc = (np.asarray(a, np.float64)
                              for a in (kf, bf, ff, kc, bc, fc))
    # f64 truth from the f32-cast factor (isolates kernel error).
    L32p = np.float64(np.float32(L64))
    Kinv64 = np.linalg.inv(L32p @ np.swapaxes(L32p, 1, 2))
    scale = np.abs(Kinv64).max()
    # GRAD_PRECISION-class contract: the in-kernel bf16x3 decomposition
    # must stay in the same error class as the HIGH chain it mirrors
    # (both are 3-pass bf16; the splits differ, so errors don't cancel).
    err_f = np.abs(np.tril(kf) - np.tril(Kinv64)).max() / scale
    err_c = np.abs(np.tril(kc) - np.tril(Kinv64)).max() / scale
    assert err_f < 3.0 * err_c + 1e-6, (err_f, err_c)
    assert err_f < 2e-4, err_f  # absolute, on this benign conditioning
    # fast=False restores full-precision passes and the f32-faithful
    # bound (value-adjacent escape hatch).
    khi = np.asarray(jax.jit(lambda L, x: kinv_pallas._launch(
        L, x, want_kinv=True, fast=False))(L, x)[0], np.float64)
    assert np.abs(np.tril(khi) - np.tril(Kinv64)).max() / scale < 1e-5
    # lower-only contract: strictly-upper BLOCKS are zero (diagonal
    # blocks stay dense-symmetric, like kinv_from_linv(lower_only=True)).
    assert np.abs(np.triu(kf, kinv_pallas.BLOCK)).max() == 0.0
    # beta = L^-T alpha (callers pass alpha = L^-1 (xs*mask)).
    beta64 = np.stack([np.linalg.inv(L32p[i]).T @ np.asarray(x[i],
                                                             np.float64)
                       for i in range(len(x))])
    bs = np.abs(beta64).max()
    err_bf = np.abs(bf - beta64).max() / bs
    err_bc = np.abs(bc - beta64).max() / bs
    assert err_bf < 3.0 * err_bc + 1e-6, (err_bf, err_bc)
    assert err_bf < 2e-4, err_bf
    fro64 = np.stack([np.sum(np.linalg.inv(L32p[i]) ** 2)
                      for i in range(len(x))])
    np.testing.assert_allclose(ff, fro64, rtol=1e-3)
    # stats variant agrees with the kinv variant.
    bsv, fsv = jax.jit(
        lambda L, x: jax.vmap(kinv_pallas.linv_stats)(L, x))(L, x)
    np.testing.assert_allclose(np.asarray(bsv, np.float64), bf, rtol=1e-6,
                               atol=1e-7 * bs)
    np.testing.assert_allclose(np.asarray(fsv, np.float64), ff, rtol=1e-6)
    # linv_beta (in-tape K^-1 backend): V == the f64 inverse of the f32
    # factor in the GRAD class, with EXACT zeros on the whole strict
    # upper (the tape kernel's full-column contractions rely on them),
    # and stats bit-identical to the other variants.
    vv, bvv, fvv = jax.jit(
        lambda L, x: jax.vmap(kinv_pallas.linv_beta)(L, x))(L, x)
    vv = np.asarray(vv, np.float64)
    linv64 = np.stack([np.linalg.inv(L32p[i]) for i in range(len(x))])
    assert np.abs(np.triu(vv, 1)).max() == 0.0
    assert np.abs(vv - np.tril(linv64)).max() / np.abs(linv64).max() \
        < 2e-4
    np.testing.assert_allclose(np.asarray(bvv, np.float64), bf, rtol=1e-6,
                               atol=1e-7 * bs)
    np.testing.assert_allclose(np.asarray(fvv, np.float64), ff, rtol=1e-6)


def test_grad_precision_bwd_chain_error_bound():
    """Pins the TPU-side gradient error of the GRAD_PRECISION backward
    chain (ADVICE r2): tri_inv_blocked + kinv_from_linv at HIGH on an
    ill-conditioned N=1024 GP gram, against the same chain at HIGHEST
    and an f64 host reference. Guards two regressions: a silent drop of
    GRAD_PRECISION to DEFAULT (error would jump ~100x) and an accidental
    rerouting of a value-path contraction through GRAD_PRECISION (the
    CPU-f64 parity suite cannot see either, Precision being a no-op
    there)."""
    N = 1024
    ts = np.linspace(0, 1, N)
    # Small-noise SE gram: cond ~ 1e6, the hard end of HMC's range.
    K64 = np.exp(-0.5 * ((ts[:, None] - ts[None, :]) / 0.25) ** 2) \
        + 1e-4 * np.eye(N)
    K32p = np.float64(np.float32(K64))
    L64 = np.linalg.cholesky(K32p)
    Kinv64 = np.linalg.inv(K32p)
    L = jnp.asarray(np.float32(L64))[None]
    scale = np.abs(Kinv64).max()

    def chain(L, pm):
        Linv = gp_math.tri_inv_blocked(L, precision=pm)
        return gp_math.kinv_from_linv(Linv, precision=pm)

    hi = np.asarray(jax.jit(
        lambda L: chain(L, jax.lax.Precision.HIGHEST))(L)[0], np.float64)
    gp = np.asarray(jax.jit(
        lambda L: chain(L, gp_math.GRAD_PRECISION))(L)[0], np.float64)

    err_hi = np.abs(hi - Kinv64).max() / scale
    err_gp = np.abs(gp - Kinv64).max() / scale
    # HIGHEST is f32-faithful even on this conditioning; GRAD_PRECISION
    # (HIGH) compounds bf16-pass error through the combine levels but
    # must stay within the documented 1e-2 relative bound — small enough
    # that HMC acceptance (driven by the exact-LML ratio) is unaffected.
    assert err_hi < 1e-4, err_hi
    assert err_gp < 1e-2, err_gp
    # The two settings must actually differ (GRAD_PRECISION not silently
    # promoted) unless the platform ignores precision entirely.
    assert err_gp > err_hi, (err_gp, err_hi)
