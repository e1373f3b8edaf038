"""Core math tests: tensor-trace covariance, LML, posterior, prior.

Oracles follow the reference semantics (GP.jl / Model.jl), using the
float64 numpy symbolic evaluator as ground truth for the device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal, norm

from autogp_tpu import config as C
from autogp_tpu import gp_math, model, tree
from autogp_tpu import kernels as K
from autogp_tpu.config import GPConfig


def base_kernels():
    # Matches test/test_GP.jl:24-33.
    return [
        K.WhiteNoise(1.0),
        K.Constant(0.5),
        K.Linear(0.1, 1.3, 0.7),
        K.SquaredExponential(0.47, 0.13),
        K.GammaExponential(0.42, 0.58, 3.2),
        K.Periodic(0.96, 0.21, 1.1),
    ]


def composite_kernels():
    b = base_kernels()
    out = []
    for i in range(len(b)):
        for j in range(len(b)):
            out.append(b[i] + b[j])
            out.append(b[i] * b[j])
            out.append(K.ChangePoint(b[i], b[j], 0.5, C.CHANGEPOINT_SCALE))
    out.append((b[2] + b[5]) * (b[4] + b[3]))
    out.append(K.ChangePoint(b[2] * b[5], b[4] + b[1], 0.3,
                             C.CHANGEPOINT_SCALE))
    return out


CFG = GPConfig(static_max_depth=4)


@jax.jit
def _eval_jit(nt, pz, ts1, ts2):
    tables = model.prior_tables(CFG)
    pt = model.transform_params(nt, pz, tables.ttable)
    return gp_math.eval_cov(nt, pt, ts1, ts2, CFG.depth_cap)


def encode_eval(node, ts1, ts2=None):
    """Evaluate covariance through the tensor-trace device path."""
    nt, pz = tree.node_to_tensor(node, CFG)
    t2 = ts1 if ts2 is None else ts2
    return np.asarray(_eval_jit(jnp.asarray(nt), jnp.asarray(pz),
                                jnp.asarray(ts1), jnp.asarray(t2)))


@pytest.mark.parametrize("node", base_kernels() + composite_kernels(),
                         ids=lambda n: K.pretty(n)[:40])
def test_tensor_eval_matches_symbolic(node):
    ts = np.linspace(0.0, 1.0, 37)
    K_sym = K.eval_cov(node, ts)
    K_dev = encode_eval(node, ts)
    K_dev = 0.5 * (K_dev + K_dev.T)
    np.testing.assert_allclose(K_dev, K_sym, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("node", base_kernels()[2:],
                         ids=lambda n: K.pretty(n)[:40])
def test_tensor_eval_cross(node):
    ts1 = np.linspace(0.0, 1.0, 13)
    ts2 = np.linspace(0.5, 2.0, 7)
    np.testing.assert_allclose(
        encode_eval(node, ts1, ts2), K.eval_cov(node, ts1, ts2),
        rtol=1e-9, atol=1e-12)


def test_node_tensor_roundtrip():
    for node in composite_kernels():
        if any(isinstance(n, K.WhiteNoise) for n in K.unroll(node)):
            continue  # WhiteNoise is not part of the prior grammar.
        nt, pz = tree.node_to_tensor(node, CFG)
        node2 = tree.tensor_to_node(nt, pz, CFG)
        assert node.isapprox(node2, rtol=1e-8), (node, node2)


def test_roundtrip_rejects_too_deep():
    cfg = GPConfig(static_max_depth=2)
    node = (K.Linear(1.0) + K.Linear(2.0)) * K.Periodic(1.0, 1.0)
    with pytest.raises(ValueError):
        tree.node_to_tensor(node, cfg)


def test_masked_lml_matches_scipy():
    rng = np.random.default_rng(0)
    node = K.Linear(0.3, 1.1, 0.9) + K.Periodic(0.7, 0.4, 1.3)
    noise = 0.1 + C.MODEL_JITTER
    n, pad = 23, 32
    ts = np.linspace(0, 1, n)
    Kmat = K.compute_cov_matrix_vectorized(node, noise, ts)
    xs = rng.multivariate_normal(np.zeros(n), Kmat)
    want = multivariate_normal.logpdf(xs, mean=np.zeros(n), cov=Kmat)

    nt, pz = tree.node_to_tensor(node, CFG)
    tables = model.prior_tables(CFG)
    pt = model.transform_params(jnp.asarray(nt), jnp.asarray(pz),
                                tables.ttable)
    ts_pad = np.zeros(pad)
    ts_pad[:n] = ts
    xs_pad = np.zeros(pad)
    xs_pad[:n] = xs
    mask = np.zeros(pad)
    mask[:n] = 1.0
    got = gp_math.lml_masked(jnp.asarray(nt), pt, noise,
                             jnp.asarray(ts_pad), jnp.asarray(xs_pad),
                             jnp.asarray(mask), CFG.depth_cap)
    np.testing.assert_allclose(float(got), want, rtol=1e-9)

    # Empty mask -> logpdf == 0.
    got0 = gp_math.lml_masked(jnp.asarray(nt), pt, noise,
                              jnp.asarray(ts_pad), jnp.asarray(xs_pad),
                              jnp.zeros(pad), CFG.depth_cap)
    assert float(got0) == 0.0

    # Bucket invariance: the per-step annealing buckets
    # (smc.run_smc_anneal_data) rely on the LML being independent of the
    # pad size — the same prefix under a larger bucket must give the
    # same value to fp accumulation order.
    for pad2 in (64, 128):
        tp2 = np.zeros(pad2); tp2[:n] = ts
        xp2 = np.zeros(pad2); xp2[:n] = xs
        mk2 = np.zeros(pad2); mk2[:n] = 1.0
        got2 = gp_math.lml_masked(jnp.asarray(nt), pt, noise,
                                  jnp.asarray(tp2), jnp.asarray(xp2),
                                  jnp.asarray(mk2), CFG.depth_cap)
        np.testing.assert_allclose(float(got2), float(got), rtol=1e-12)


@pytest.mark.parametrize("n,base", [(16, 16), (64, 16), (128, 8),
                                    (256, 16)])
def test_tri_inv_blocked(n, base):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, n, n))
    L = np.linalg.cholesky(A @ np.swapaxes(A, 1, 2) + n * np.eye(n))
    W = np.asarray(gp_math.tri_inv_blocked(jnp.asarray(L), base=base))
    np.testing.assert_allclose(W, np.linalg.inv(L), rtol=1e-9, atol=1e-10)
    # strictly lower-triangular output
    assert np.allclose(np.triu(W, 1), 0.0)


@pytest.mark.parametrize("n", [96, 128, 256])
def test_solve_lower_blocked(n):
    rng = np.random.default_rng(4)
    A = rng.standard_normal((n, n))
    L = np.linalg.cholesky(A @ A.T + n * np.eye(n))
    x = rng.standard_normal(n)
    got = np.asarray(gp_math.solve_lower_blocked(jnp.asarray(L),
                                                 jnp.asarray(x)))
    np.testing.assert_allclose(got, np.linalg.solve(L, x), rtol=1e-9,
                               atol=1e-10)


@pytest.mark.parametrize("n,pad", [(19, 24), (100, 128)])
def test_mvn_logpdf_custom_vjp_matches_autodiff(n, pad):
    """Closed-form VJP (beta beta^T - K^-1)/2 vs XLA autodiff through
    Cholesky + triangular solve, incl. masked padding. pad=128 exercises
    the blocked-triangular-inverse branch; pad=24 the cho_solve branch."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((n, n))
    Kact = A @ A.T + 0.5 * np.eye(n)
    Kmat = np.zeros((pad, pad))
    Kmat[:n, :n] = Kact
    Kmat += rng.standard_normal((pad, pad)) * 1e-12  # junk in padding
    xs = np.zeros(pad)
    xs[:n] = rng.standard_normal(n)
    mask = np.zeros(pad)
    mask[:n] = 1.0
    Kj, xj, mj = jnp.asarray(Kmat), jnp.asarray(xs), jnp.asarray(mask)

    v0 = gp_math.mvn_logpdf_masked(Kj, xj, mj)
    v1 = gp_math.mvn_logpdf_masked_cvjp(Kj, xj, mj)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)

    g0 = jax.grad(gp_math.mvn_logpdf_masked, argnums=(0, 1))(Kj, xj, mj)
    g1 = jax.grad(gp_math.mvn_logpdf_masked_cvjp, argnums=(0, 1))(Kj, xj, mj)
    # Autodiff through cholesky concentrates dK in the lower triangle;
    # the closed form is symmetric. Compare symmetrized (equal when
    # contracted against any symmetric dK/dtheta).
    sym0 = np.asarray(g0[0] + g0[0].T)
    sym1 = np.asarray(g1[0] + g1[0].T)
    np.testing.assert_allclose(sym0, sym1, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=1e-8, atol=1e-12)


def test_posterior_mvn_f32_dense_grid_is_psd():
    """The joint-Cholesky conditional must stay PSD in float32 on a dense
    interleaved prediction grid (the explicit Schur complement measured
    eigenvalues of -3.6 here and NaN'd the predictive logpdf)."""
    rng = np.random.default_rng(0)
    node = K.Linear(0.5, 1.0, 1.0) + K.Periodic(2.0, 1.0, 1.0)
    noise = 0.05 + C.MODEL_JITTER
    n_all, n_obs = 500, 100
    ts = np.linspace(0, 10, n_all)
    Kt = K.compute_cov_matrix_vectorized(node, noise, ts)
    xs = rng.multivariate_normal(np.zeros(n_all), Kt)
    perm = rng.permutation(n_all)
    oi, ti_ = np.sort(perm[:n_obs]), np.sort(perm[n_obs:])

    nt, pz = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    tables = model.prior_tables(CFG)
    f32 = jnp.float32
    pt = model.transform_params(nt, jnp.asarray(pz, f32),
                                jnp.asarray(tables.ttable, f32))
    mu, cov = gp_math.posterior_mvn_masked(
        nt, pt, f32(noise), jnp.asarray(ts[oi], f32),
        jnp.asarray(xs[oi], f32), jnp.ones(n_obs, f32),
        jnp.asarray(ts[ti_], f32), CFG.depth_cap)
    cov64 = np.asarray(cov, np.float64)
    assert np.isfinite(cov64).all()
    ev = np.linalg.eigvalsh(cov64)
    assert ev.min() > 0, ev.min()
    lp = gp_math.mvn_logpdf(mu, cov, jnp.asarray(xs[ti_], f32))
    assert np.isfinite(float(lp))


def test_lml_noise_grad_analytic_matches_autodiff():
    """lml_value_and_noise_grad == jax.grad through the full LML, on the
    power-of-two (blocked-inverse) path."""
    node = K.Linear(0.3, 1.1, 0.9) + K.Periodic(0.7, 0.4, 1.3)
    nt, pz = tree.node_to_tensor(node, CFG)
    nt, pz = jnp.asarray(nt), jnp.asarray(pz)
    tables = model.prior_tables(CFG)
    rng = np.random.default_rng(5)
    n, pad = 100, 128
    ts = np.zeros(pad); ts[:n] = np.linspace(0, 1, n)
    xs = np.zeros(pad); xs[:n] = np.sin(np.linspace(0, 9, n))
    mask = np.zeros(pad); mask[:n] = 1.0
    ts, xs, mask = map(jnp.asarray, (ts, xs, mask))
    nz = jnp.asarray(0.37)

    val_a, g_a = model.lml_value_and_noise_grad(nt, pz, nz, ts, xs, mask,
                                                CFG, tables, pallas=False)
    val_b, g_b = jax.value_and_grad(
        lambda z: model.lml(nt, pz, z, ts, xs, mask, CFG, tables,
                            pallas=False))(nz)
    np.testing.assert_allclose(float(val_a), float(val_b), rtol=1e-10)
    np.testing.assert_allclose(float(g_a), float(g_b), rtol=1e-8)


def test_posterior_mvn_matches_reference_formula():
    """Schur-complement conditional (GP.jl:731-758) vs direct computation."""
    rng = np.random.default_rng(1)
    node = K.Linear(0.3, 1.1, 0.9) * K.Periodic(0.7, 0.4, 1.3)
    noise = 0.05
    n, p, pad = 20, 9, 32
    ts = np.linspace(0, 1, n)
    ts_pred = np.linspace(0.8, 1.5, p)
    xs = rng.standard_normal(n)

    z = np.concatenate([ts, ts_pred])
    Kz = K.eval_cov(node, z)
    K11 = Kz[:n, :n] + noise * np.eye(n)
    K12 = Kz[:n, n:]
    K22 = Kz[n:, n:]
    mu_want = K12.T @ np.linalg.solve(K11, xs)
    cov_want = K22 - K12.T @ np.linalg.solve(K11, K12)
    cov_want = 0.5 * (cov_want + cov_want.T) + noise * np.eye(p)

    nt, pz = tree.node_to_tensor(node, CFG)
    tables = model.prior_tables(CFG)
    pt = model.transform_params(jnp.asarray(nt), jnp.asarray(pz),
                                tables.ttable)
    ts_pad = np.zeros(pad); ts_pad[:n] = ts
    xs_pad = np.zeros(pad); xs_pad[:n] = xs
    mask = np.zeros(pad); mask[:n] = 1.0
    mu, cov = gp_math.posterior_mvn_masked(
        jnp.asarray(nt), pt, noise, jnp.asarray(ts_pad), jnp.asarray(xs_pad),
        jnp.asarray(mask), jnp.asarray(ts_pred), CFG.depth_cap)
    np.testing.assert_allclose(np.asarray(mu), mu_want, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov), cov_want, rtol=1e-6,
                               atol=1e-9)


def test_param_transforms_roundtrip():
    cfg = GPConfig()
    for field, val in [("gamma", 0.58), ("period", 0.21),
                       ("wildcard", 3.2), ("noise", 0.7)]:
        z = model.untransform_param(field, val, cfg)
        back = float(model.transform_param(field, z, cfg))
        np.testing.assert_allclose(back, val, rtol=1e-12)


def test_tree_prior_logpdf_matches_hand_computation():
    """Prior density of an explicit tree vs the recursive definition."""
    cfg = GPConfig(max_depth=3, changepoints=True)
    tables = model.prior_tables(cfg)
    node = K.Linear(0.5) * K.Periodic(1.0, 1.0)
    nt, pz = tree.node_to_tensor(node, cfg)

    # Hand computation following Model.jl:78-128.
    lp = 0.0
    lp += np.log(cfg.node_dist_cp[C.TIMES - 1])       # root Times, cp row
    # children at depth 2 (changepoints disabled below Times -> nocp row)
    lp += np.log(cfg.node_dist_nocp[C.LINEAR - 1])
    lp += np.log(cfg.node_dist_nocp[C.PERIODIC - 1])
    z = np.concatenate([pz[1][:3], pz[2][:3]])
    lp += norm.logpdf(z).sum()

    got = model.tree_prior_logpdf(jnp.asarray(nt), jnp.asarray(pz), tables)
    np.testing.assert_allclose(float(got), lp, rtol=1e-10)

    # A leaf at max_depth uses the leaf distribution (Model.jl:69-70).
    cfg2 = GPConfig(max_depth=2)
    tables2 = model.prior_tables(cfg2)
    nt2, pz2 = tree.node_to_tensor(node, cfg2)
    lp2 = (np.log(cfg2.node_dist_cp[C.TIMES - 1])
           + np.log(cfg2.node_dist_leaf[C.LINEAR - 1])
           + np.log(cfg2.node_dist_leaf[C.PERIODIC - 1])
           + norm.logpdf(z).sum())
    got2 = model.tree_prior_logpdf(jnp.asarray(nt2), jnp.asarray(pz2),
                                   tables2)
    np.testing.assert_allclose(float(got2), lp2, rtol=1e-10)


def test_sample_tree_statistics():
    """Prior sampler: valid trees, root type frequencies match the prior."""
    cfg = GPConfig(max_depth=3)
    tables = model.prior_tables(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    nts, pzs = jax.vmap(lambda k: model.sample_tree(k, tables))(keys)
    nts = np.asarray(nts)
    assert (nts[:, 0] > 0).all()
    # Children active iff parent is an operator.
    for s in range(1, cfg.max_nodes):
        par = (s - 1) // 2
        is_op = np.isin(nts[:, par], [C.PLUS, C.TIMES, C.CHANGEPOINT])
        assert ((nts[:, s] > 0) == is_op).all()
    # Leaf-depth slots are never operators.
    for s in range(cfg.max_nodes // 2, cfg.max_nodes):
        assert not np.isin(nts[:, s], [C.PLUS, C.TIMES, C.CHANGEPOINT]).any()
    # Root frequencies approximately follow node_dist_cp.
    freqs = np.bincount(nts[:, 0], minlength=9)[1:9] / len(nts)
    np.testing.assert_allclose(freqs, cfg.node_dist_cp, atol=0.06)
    # Sampled trees score with finite prior density.
    lp = jax.vmap(
        lambda t, p: model.tree_prior_logpdf(t, p, tables))(
            jnp.asarray(nts), pzs)
    assert np.isfinite(np.asarray(lp)).all()


def test_sample_then_score_consistency():
    """Monte-Carlo check: average self-density is finite & sane, and
    sampling respects the changepoint gate."""
    cfg = GPConfig(max_depth=3, changepoints=False)
    tables = model.prior_tables(cfg)
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    nts, _ = jax.vmap(lambda k: model.sample_tree(k, tables))(keys)
    assert not (np.asarray(nts) == C.CHANGEPOINT).any()


def test_subtree_sizes():
    node = (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0)
    nt, _ = tree.node_to_tensor(node, CFG)
    sizes = np.asarray(tree.subtree_sizes(jnp.asarray(nt)))
    assert sizes[0] == 5
    assert sizes[1] == 3
    assert sizes[2] == 1
    assert sizes[3] == 1
    assert sizes[4] == 1
    assert int(tree.tree_depth(jnp.asarray(nt))) == 3
