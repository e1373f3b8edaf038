"""Inference-layer tests.

Key oracles:
  - pick_random_node: empirical pick frequencies match the walk densities
    (uniform over nodes when unbiased, inference_utils.jl:17-24).
  - MH subtree-replace with NO data leaves the prior invariant (the
    acceptance ratio must then reduce to the proposal symmetry).
  - HMC with NO data has the standard-normal prior as stationary dist.
  - SMC reweight equals the directly computed LML difference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import config as C
from autogp_tpu import model, tree
from autogp_tpu import kernels as K
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import moves, smc

CFG = GPConfig(max_depth=3)
TABLES = model.prior_tables(CFG)


def empty_data(size=32):
    z = jnp.zeros((size,), jnp.float64)
    return (z, z, z)


def test_pick_node_uniform_frequencies():
    node = (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0)
    nt, _ = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    sizes = tree.subtree_sizes(nt).astype(jnp.float64)

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    idxs, paths = jax.jit(jax.vmap(
        lambda k: moves.sample_pick_node(k, nt, sizes, False,
                                         CFG.depth_cap)))(keys)
    idxs = np.asarray(idxs)
    # Unbiased: every node uniformly (p = 1/size = 1/5).
    active = [0, 1, 2, 3, 4]  # slots of the 5 active nodes
    freqs = {s: (idxs == s).mean() for s in set(idxs.tolist())}
    assert set(freqs) == set(active)
    for s in active:
        assert abs(freqs[s] - 0.2) < 0.03, (s, freqs)

    # assess = log(1/5) for every sampled path on this tree.
    logqs, idx2 = jax.jit(jax.vmap(
        lambda p: moves.assess_pick_node(p, nt, sizes, False,
                                         CFG.depth_cap)))(paths)
    np.testing.assert_allclose(np.asarray(logqs), np.log(0.2), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(idx2), idxs)


def test_pick_node_biased_frequencies():
    node = (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0)
    nt, _ = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    sizes = tree.subtree_sizes(nt).astype(jnp.float64)
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    idxs, paths = jax.jit(jax.vmap(
        lambda k: moves.sample_pick_node(k, nt, sizes, True,
                                         CFG.depth_cap)))(keys)
    idxs = np.asarray(idxs)
    # biased: p(root)=.5; p(left subtree root +)= .5*.5*.5; leaves deeper.
    want = {0: 0.5, 1: 0.125, 2: 0.25, 3: 0.0625, 4: 0.0625}
    for s, p in want.items():
        assert abs((idxs == s).mean() - p) < 0.03, (s, p)
    logqs, _ = jax.jit(jax.vmap(
        lambda p: moves.assess_pick_node(p, nt, sizes, True,
                                         CFG.depth_cap)))(paths)
    # Empirical consistency: mean exp(logq) over samples of each idx == p.
    for s, p in want.items():
        got = np.exp(np.asarray(logqs)[idxs == s])
        np.testing.assert_allclose(got, p, rtol=1e-9)


def _tree_stats(nts):
    """Summary stats of a batch of trees for distribution comparison."""
    nts = np.asarray(nts)
    sizes = np.asarray(jax.vmap(tree.subtree_sizes)(jnp.asarray(nts)))[:, 0]
    root = nts[:, 0]
    return sizes, root


def test_mh_no_data_preserves_prior():
    """With empty data the posterior IS the prior: many MH steps from
    prior samples must keep tree-size and root-type distributions."""
    P = 256
    keys = jax.random.split(jax.random.PRNGKey(2), P)
    nt0, pz0 = jax.vmap(lambda k: model.sample_tree(k, TABLES,
                                                    dtype=jnp.float64))(keys)
    noise = jnp.zeros((P,), jnp.float64)
    lml0 = jnp.zeros((P,), jnp.float64)
    data = empty_data()

    def chain(key, nt, pz, nz, lml):
        def body(carry, k):
            nt, pz, lml = carry
            r = moves.subtree_replace_step(k, nt, pz, nz, lml, data, CFG,
                                           TABLES)
            return (r.node_type, r.params, r.lml), r.accepted
        (nt, pz, lml), acc = jax.lax.scan(body, (nt, pz, lml),
                                          jax.random.split(key, 30))
        return nt, pz, acc.mean()

    keys2 = jax.random.split(jax.random.PRNGKey(3), P)
    nt1, pz1, acc = jax.jit(jax.vmap(chain))(keys2, nt0, pz0, noise, lml0)

    s0, r0 = _tree_stats(nt0)
    s1, r1 = _tree_stats(nt1)
    # Acceptance should be high with no data (proposal ~ prior).
    assert float(jnp.mean(acc)) > 0.5
    # Size distribution preserved (prior mean size ~3.4 for this config).
    assert abs(s0.mean() - s1.mean()) < 0.45, (s0.mean(), s1.mean())
    # Root-type frequencies preserved within MC error.
    f0 = np.bincount(r0, minlength=9)[1:] / P
    f1 = np.bincount(r1, minlength=9)[1:] / P
    assert np.abs(f0 - f1).max() < 0.12, (f0, f1)


@pytest.mark.slow  # MC stationarity oracle, ~3 min
def test_hmc_no_data_stationary_normal():
    """With empty data, HMC on params/noise targets N(0,1) exactly."""
    P = 128
    node = K.Linear(0.5) * K.Periodic(1.0, 1.0)
    nt, pz = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    nts = jnp.tile(nt[None], (P, 1))
    pzs = jnp.tile(jnp.asarray(pz)[None], (P, 1, 1))
    nzs = jnp.zeros((P,), jnp.float64)
    data = empty_data()
    # Trajectory length eps*L ~ pi/2: for a unit Gaussian target the
    # position after one trajectory is ~ cos(tau) q + sin(tau) p ~ N(0,1),
    # i.e. nearly independent draws (tau ~ pi flips the sign instead).
    hmc_cfg = hmc_mod.HMCConfig(n_exit=10 ** 9, eps_param=0.157, L_param=10,
                                eps_noise=0.157, L_noise=10)

    def chain(key, nt1, pz1, nz1):
        lml = jnp.asarray(0.0, jnp.float64)
        def body(carry, k):
            pz1, nz1, lml = carry
            pz2, nz2, lml2, _, _sw = hmc_mod.rejuvenate_parameters(
                k, nt1, pz1, nz1, lml, data, CFG, TABLES, 5, hmc_cfg, True)
            return (pz2, nz2, lml2), None
        (pz1, nz1, _), _ = jax.lax.scan(body, (pz1, nz1, lml),
                                        jax.random.split(key, 8))
        return pz1, nz1

    keys = jax.random.split(jax.random.PRNGKey(4), P)
    pz_f, nz_f = jax.jit(jax.vmap(chain))(keys, nts, pzs, nzs)
    pmask = np.asarray(tree.param_mask(nt))
    vals = np.asarray(pz_f)[:, pmask > 0]            # [P, n_active]
    flat = np.concatenate([vals.ravel(), np.asarray(nz_f)])
    # 40 HMC trajectories per chain from a fixed point: moments ~ N(0,1).
    assert abs(flat.mean()) < 0.1, flat.mean()
    assert abs(flat.std() - 1.0) < 0.1, flat.std()


def test_reweight_matches_direct_lml():
    rng = np.random.default_rng(0)
    n = 24
    ts = np.linspace(0, 1, n)
    xs = np.sin(6 * ts) + 0.1 * rng.standard_normal(n)
    data0 = smc.make_dataset(ts, xs, n=0, pad_to=32)
    data1 = smc.make_dataset(ts, xs, n=10, pad_to=32)
    data2 = smc.make_dataset(ts, xs, n=24, pad_to=32)

    parts = smc.initialize(jax.random.PRNGKey(0), 16, data0, CFG, TABLES)
    np.testing.assert_allclose(np.asarray(parts.log_weights), 0.0,
                               atol=1e-12)
    p1 = smc.reweight(parts, data1, CFG, TABLES)
    direct1 = smc._lml_all(parts.node_type, parts.params, parts.noise_z,
                           data1, CFG, TABLES)
    np.testing.assert_allclose(np.asarray(p1.log_weights),
                               np.asarray(direct1), rtol=1e-9)
    p2 = smc.reweight(p1, data2, CFG, TABLES)
    direct2 = smc._lml_all(parts.node_type, parts.params, parts.noise_z,
                           data2, CFG, TABLES)
    np.testing.assert_allclose(np.asarray(p2.log_weights),
                               np.asarray(direct2), rtol=1e-9)


def test_resampling_semantics():
    key = jax.random.PRNGKey(5)
    data0 = smc.make_dataset(np.zeros(4), np.zeros(4), n=0, pad_to=32)
    parts = smc.initialize(key, 8, data0, CFG, TABLES)
    # Skewed weights -> low ESS -> resample triggers.
    lw = jnp.asarray([10., 0., 0., 0., 0., 0., 0., 0.], jnp.float64)
    parts = parts._replace(log_weights=lw)
    ess = float(smc.effective_sample_size(lw))
    assert ess < 1.1
    new, did = smc.maybe_resample(key, parts, ess_threshold=4.0)
    assert bool(did)
    np.testing.assert_allclose(np.asarray(new.log_weights), 0.0)
    lse = float(jax.scipy.special.logsumexp(lw))
    np.testing.assert_allclose(float(new.log_ml_est), lse - np.log(8),
                               rtol=1e-12)
    # Dominant particle should be cloned into nearly all slots.
    assert (np.asarray(new.parents) == 0).mean() > 0.8
    # High ESS -> no resample; `parents` persists from the LAST resample
    # (Gen semantics, consumed by scripts/online.jl:67) rather than being
    # reset to the identity.
    old_parents = jnp.asarray([3, 3, 1, 0, 7, 7, 7, 2], jnp.int32)
    parts2 = parts._replace(log_weights=jnp.zeros(8, jnp.float64),
                            parents=old_parents)
    new2, did2 = smc.maybe_resample(key, parts2, ess_threshold=4.0)
    assert not bool(did2)
    np.testing.assert_array_equal(np.asarray(new2.parents),
                                  np.asarray(old_parents))


def test_smc_end_to_end_smoke():
    """Small full fit: runs, finite estimates, structures adapt to data."""
    rng = np.random.default_rng(1)
    n = 32
    ts = np.linspace(0, 1, n)
    xs = np.sin(2 * np.pi * 4 * ts) + 0.05 * rng.standard_normal(n)

    parts = smc.run_smc_anneal_data(
        jax.random.PRNGKey(0), ts, xs, CFG, TABLES,
        n_particles=8, schedule=[8, 16, 32], n_mcmc=6, n_hmc=4,
        permutation=rng.permutation(n))
    lml = np.asarray(parts.lml)
    assert np.isfinite(lml).all()
    assert np.isfinite(np.asarray(parts.log_weights)).all()
    # The fit should beat the typical prior-sample likelihood by a lot.
    data = smc.make_dataset(ts, xs, n=n, pad_to=32)
    prior_parts = smc.initialize(jax.random.PRNGKey(9), 8, data, CFG,
                                 TABLES)
    assert lml.max() > np.asarray(prior_parts.lml).max()
    # Decoded kernels are valid symbolic trees.
    for i in range(8):
        node = tree.tensor_to_node(np.asarray(parts.node_type[i]),
                                   np.asarray(parts.params[i]), CFG)
        assert node.size >= 1


def test_smc_anneal_depth_smoke():
    """Depth-annealed SMC variant: runs, finite weights, depth grows."""
    from autogp_tpu.inference import smc_depth
    rng = np.random.default_rng(2)
    n = 24
    ts = np.linspace(0, 1, n)
    xs = np.sin(2 * np.pi * 3 * ts) + 0.1 * rng.standard_normal(n)
    parts, cfg = smc_depth.run_smc_anneal_depth(
        jax.random.PRNGKey(0), ts, xs, schedule=[1, 2],
        n_particles=4, n_mcmc=1, n_hmc=1)
    assert cfg.max_depth == 2
    assert parts.node_type.shape[1] == 3
    assert np.isfinite(np.asarray(parts.log_weights)).all()
    assert np.isfinite(np.asarray(parts.lml)).all()
    # Trees remain valid under the final config.
    nts = np.asarray(parts.node_type)
    for s in range(1, 3):
        par = (s - 1) // 2
        is_op = np.isin(nts[:, par], [6, 7, 8])
        assert ((nts[:, s] > 0) == is_op).all()


@pytest.mark.parametrize("P,W", [(16, 8), (20, 8)])
def test_hmc_compaction_matches_uncompacted(P, W):
    """The chunked HMC dispatch (gather enabled particles to the front,
    scan over fixed-width chunks) must be a pure execution-layout change:
    per-particle trajectories use per-particle keys, so results are
    identical to the full-width masked path. P=20 covers the padded case
    (3 chunks of 8 for 20 particles: 4 duplicated trailing indices)."""
    rng = np.random.default_rng(3)
    n = 16
    ts = np.linspace(0, 1, n)
    xs = np.sin(2 * np.pi * 2 * ts) + 0.1 * rng.standard_normal(n)
    data = smc.make_dataset(ts, xs, n=n, pad_to=32)
    parts = smc.initialize(jax.random.PRNGKey(5), P, data, CFG, TABLES)
    assert smc._hmc_chunk_width(P, True) == W

    key = jax.random.PRNGKey(11)
    hc = hmc_mod.HMCConfig(L_param=3, L_noise=3, n_exit=1)
    out = {}
    for compact in (False, True):
        p2, n_acc, n_sw, _ok = smc.rejuvenate_structure(
            key, parts, data, CFG, TABLES, n_mcmc=3, n_hmc=2,
            biased=False, hmc_cfg=hc, infer_noise=True,
            hmc_compact=compact)
        out[compact] = (p2, np.asarray(n_acc), np.asarray(n_sw))

    a, b = out[False], out[True]
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    for fa, fb in zip(a[0], b[0]):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=0, atol=0)
    assert a[2].sum() > 0  # some HMC actually ran


def test_smc_anneal_depth_prior_oracle():
    """Enumerable oracle for the depth-extension weight
    (smc_depth.attach_extend_step, reference
    inference_smc_anneal_depth.jl:17-91): with EMPTY data the target at
    every depth is the prior, so after annealing depth 1 -> 2 the
    WEIGHTED structure distribution must equal the exactly-enumerable
    depth-2 prior. A wrong proposal/aux density in the extension weight
    would bias these frequencies."""
    from autogp_tpu.inference import smc_depth

    P = 512
    parts, cfg = smc_depth.run_smc_anneal_depth(
        jax.random.PRNGKey(7), np.zeros(0), np.zeros(0), schedule=[1, 2],
        n_particles=P, n_mcmc=1, n_hmc=0, noise=1.0)
    assert cfg.max_depth == 2
    nts = np.asarray(parts.node_type)
    w = np.asarray(smc.normalized_weights(parts.log_weights))
    ess = float(smc.effective_sample_size(parts.log_weights))
    assert ess > 50

    # Exact depth-2 prior over structures (node_dist_cp at the root,
    # node_dist_leaf below an operator; GP.jl:1099-1138).
    d_cp = np.asarray(cfg.node_dist_cp)
    d_leaf = np.asarray(cfg.node_dist_leaf)
    probs = {}
    for root in range(1, 9):
        if d_cp[root - 1] == 0:
            continue
        if root in (C.PLUS, C.TIMES, C.CHANGEPOINT):
            for left in range(1, 6):
                for right in range(1, 6):
                    if d_leaf[left - 1] > 0 and d_leaf[right - 1] > 0:
                        probs[root * 100 + left * 10 + right] = (
                            d_cp[root - 1] * d_leaf[left - 1]
                            * d_leaf[right - 1])
        else:
            probs[root * 100] = d_cp[root - 1]
    assert abs(sum(probs.values()) - 1.0) < 1e-12

    keys_got = nts[:, 0] * 100 + nts[:, 1] * 10 + nts[:, 2]
    for sk, pw in sorted(probs.items()):
        got = float(w[keys_got == sk].sum())
        tol = 5.0 * np.sqrt(pw * (1 - pw) / ess) + 0.02
        assert abs(got - pw) < tol, (sk, got, pw, tol)


@pytest.mark.slow  # MC posterior oracle, ~1 min
def test_smc_anneal_depth_posterior_oracle():
    """DATA-dependent oracle for the depth-extension weight: the
    depth-annealed ensemble's structure posterior must match the
    data-annealed SMC posterior on the same observations (both target
    p(structure | data) at max_depth=2). This is the only validation the
    extension weight's leaf_cap-scored old-config density
    (smc_depth.attach_extend_step, inference_smc_anneal_depth.jl:17-91)
    gets with data in the target: a wrong leaf_cap prior ratio or
    proposal density would bias these frequencies relative to the
    independently-validated data-annealing engine."""
    from autogp_tpu.inference import smc_depth

    rng = np.random.default_rng(3)
    n = 12
    ts = np.linspace(0.0, 1.0, n)
    xs = 0.6 * np.sin(2 * np.pi * 2 * ts) + 0.3 * rng.standard_normal(n)
    P = 1024
    hc = hmc_mod.HMCConfig(L_param=3, L_noise=3, n_exit=1)

    def structure_freqs(parts):
        nts = np.asarray(parts.node_type)
        w = np.asarray(smc.normalized_weights(parts.log_weights))
        keys = nts[:, 0] * 100 + nts[:, 1] * 10 + nts[:, 2]
        return keys, w, float(smc.effective_sample_size(parts.log_weights))

    # Depth-annealed: depth 1 -> 2 with the data in the target throughout.
    parts_d, cfg = smc_depth.run_smc_anneal_depth(
        jax.random.PRNGKey(5), ts, xs, schedule=[1, 2], n_particles=P,
        n_mcmc=3, n_hmc=2, noise=0.1, hmc_cfg=hc)
    assert cfg.max_depth == 2
    keys_d, w_d, ess_d = structure_freqs(parts_d)

    # Data-annealed reference on the same data and final config.
    cfg2 = C.GPConfig(max_depth=2, noise=0.1)
    parts_a = smc.run_smc_anneal_data(
        jax.random.PRNGKey(9), ts, xs, cfg2, model.prior_tables(cfg2),
        n_particles=P, schedule=[4, 8, n], n_mcmc=3, n_hmc=2, hmc_cfg=hc)
    keys_a, w_a, ess_a = structure_freqs(parts_a)

    assert ess_d > 40 and ess_a > 40, (ess_d, ess_a)
    all_keys = sorted(set(keys_d.tolist()) | set(keys_a.tolist()))
    l1 = 0.0
    for sk in all_keys:
        pd_ = float(w_d[keys_d == sk].sum())
        pa_ = float(w_a[keys_a == sk].sum())
        se = (np.sqrt(max(pd_, pa_) * (1 - min(pd_, pa_)))
              * (1 / np.sqrt(ess_d) + 1 / np.sqrt(ess_a)))
        assert abs(pd_ - pa_) < 5.0 * se + 0.03, (sk, pd_, pa_, se)
        l1 += abs(pd_ - pa_)
    # Aggregate agreement: total variation between the two posteriors.
    assert l1 / 2 < 0.15, l1
