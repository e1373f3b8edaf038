"""GPConfig identity / cache-key semantics and the static-depth-cap deviation.

The compiled-closure caches (api._rejuv_cache, smc._round_cache,
greedy._opt_cache) must key on config CONTENT, not id(): a GC'd config's id
can be recycled by a different config, silently returning programs closed
over stale prior tables.
"""
import gc
import warnings
from fractions import Fraction

import pytest

from autogp_tpu import GPConfig
from autogp_tpu import config as C


def _cfg(**kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return GPConfig(**kw)


def test_cache_key_content_equality():
    a = _cfg(max_depth=3)
    b = _cfg(max_depth=3)
    assert a is not b and id(a) != id(b)
    assert a.cache_key == b.cache_key

    c = _cfg(max_depth=3,
             prior={"gamma": {"scale": 2.0, "mu": 0.0, "sigma": 1.0},
                    "period": {"mu": -2.5, "sigma": 1.0},
                    "wildcard": {"mu": -1.5, "sigma": 1.0}})
    assert c.cache_key != a.cache_key
    d = _cfg(max_depth=3, changepoints=False)
    assert d.cache_key != a.cache_key
    e = _cfg(max_depth=3, noise=0.1)
    assert e.cache_key != a.cache_key
    # hashable (usable as a dict key)
    {a.cache_key: 1, c.cache_key: 2}


def test_jit_caches_survive_config_gc_and_id_reuse():
    """Create a config, populate the SMC round cache, drop the config, and
    create a different-prior config: the cache must NOT alias them (the old
    id()-keyed scheme could, when the allocator recycled the id)."""
    from autogp_tpu import model as M
    from autogp_tpu.inference import hmc as hmc_mod
    from autogp_tpu.inference import smc

    hc = hmc_mod.HMCConfig()
    a = _cfg(max_depth=3)
    tables_a = M.prior_tables(a)
    fn_a = smc.smc_round_jit(a, tables_a, n_mcmc=1, n_hmc=1, biased=False,
                             hmc_cfg=hc, infer_noise=True,
                             allow_resample=True, ess_threshold=1.0,
                             adaptive_rejuvenation=False)
    key_a = a.cache_key
    del a, tables_a
    gc.collect()

    b = _cfg(max_depth=3,
             prior={"gamma": {"scale": 2.0, "mu": 0.0, "sigma": 1.0},
                    "period": {"mu": -3.0, "sigma": 0.5},
                    "wildcard": {"mu": -1.5, "sigma": 1.0}})
    fn_b = smc.smc_round_jit(b, M.prior_tables(b), n_mcmc=1, n_hmc=1,
                             biased=False, hmc_cfg=hc, infer_noise=True,
                             allow_resample=True, ess_threshold=1.0,
                             adaptive_rejuvenation=False)
    assert fn_b is not fn_a  # different prior content -> different program

    # Re-creating the ORIGINAL config content must hit the original entry.
    a2 = _cfg(max_depth=3)
    assert a2.cache_key == key_a
    fn_a2 = smc.smc_round_jit(a2, M.prior_tables(a2), n_mcmc=1, n_hmc=1,
                              biased=False, hmc_cfg=hc, infer_noise=True,
                              allow_resample=True, ess_threshold=1.0,
                              adaptive_rejuvenation=False)
    assert fn_a2 is fn_a


def test_unbounded_depth_warns():
    with pytest.warns(UserWarning, match="static_max_depth"):
        warnings.simplefilter("always")
        GPConfig(max_depth=-1)
    # explicit finite depth does not warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        GPConfig(max_depth=4)


def _truncation_mass(cfg: GPConfig) -> Fraction:
    """Exact prior probability that the reference's UNBOUNDED prior would
    sample a tree deeper than cfg.depth_cap (the mass the static tensor
    trace clips by forcing a leaf there).

    P(height > 1) = p_op; P(height > k) = p_op * (1 - (1 - P(height>k-1))^2)
    (both children must stay within budget). Operator mass is identical in
    the cp and nocp tables for the default config, and changepoints only
    alter the split among ops, not the leaf/op mass.
    """
    def p_op(dist):
        d = [Fraction(x).limit_denominator(10**9) for x in dist]
        return sum(d[C.PLUS - 1:]) / sum(d)

    p_root = p_op(cfg.node_dist_cp if cfg.changepoints else cfg.node_dist_nocp)
    p_inner = p_op(cfg.node_dist_nocp)
    # P(subtree at depth d exceeds the cap), bottom-up from the cap.
    f = p_inner  # a node at depth_cap-1: exceeds iff it is an operator
    for _ in range(cfg.depth_cap - 2):
        f = p_inner * (1 - (1 - f) ** 2)
    if cfg.depth_cap == 1:
        return p_root
    return p_root * (1 - (1 - f) ** 2) if cfg.depth_cap > 1 else p_root


def test_depth_cap_truncated_prior_mass():
    """Quantifies the prior deviation at the static depth cap (the
    documented ~6.1% for the default config) and checks it shrinks as
    static_max_depth grows."""
    cfg5 = _cfg()  # defaults: max_depth=-1, static_max_depth=5
    m5 = float(_truncation_mass(cfg5))
    assert abs(m5 - 0.0609) < 2e-3, m5
    m6 = float(_truncation_mass(_cfg(static_max_depth=6)))
    m7 = float(_truncation_mass(_cfg(static_max_depth=7)))
    assert m7 < m6 < m5
