"""CI-asserted HMC ground-truth harness (VERDICT r2 next #10).

Fast seeded mode of scripts/experiment_hmc.py (the analog of the
reference's test/experiment_hmc.jl): the Bayes-rule oracle (predictive
logp via the conditional MVN == joint-minus-marginal generate weights,
experiment_hmc.jl:111-132) is asserted inside run(); this test addition-
ally asserts that HMC from a prior draw actually recovers ground truth —
held-out predictive logp improves substantially and lands near the
true-parameter value.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


def test_hmc_ground_truth_recovery_fast():
    # bench=1 (SquaredExponential): a smooth 2-parameter posterior that
    # HMC traverses in ~40 steps at this problem size (measured acc=1.0,
    # final held-out logp within 1% of the true-parameter value). The
    # bench=2 Linear+Periodic workload needs the full-size script run
    # (N=1000, 100 steps) to mix through the period's multimodality —
    # that remains scripts/experiment_hmc.py's manual mode, like the
    # reference's test/experiment_hmc.jl.
    import experiment_hmc

    m = experiment_hmc.run(bench=1, n=160, n_obs=64, n_steps=40, seed=0,
                           verbose=False)
    # Bayes-rule oracle already asserted inside run(); sanity-pin the gap.
    assert abs(m["lp_true"] - m["lp_bayes"]) < max(
        1e-6 * abs(m["lp_bayes"]), 1e-3)
    # HMC must move: some accepted trajectories and a higher posterior
    # score than the prior draw.
    assert m["acc_rate"] > 0.2, m
    assert m["lml_final"] > m["lml_init"], m
    # Held-out predictive logp improves a lot from the prior draw and
    # closes most of the gap to the true-parameter predictive logp.
    gap0 = m["lp_true"] - m["lp_init"]
    gap1 = m["lp_true"] - m["lp_final"]
    assert gap0 > 0, m  # prior draw starts materially worse
    assert gap1 < 0.3 * gap0, m
