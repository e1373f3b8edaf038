"""End-to-end tutorial smoke tests on the vendored reference datasets.

The reference's de facto e2e suite re-executes its tutorial notebooks on
real data (.github/workflows/Tutorials.yml; SURVEY.md §4). Here each
executable tutorial in docs/tutorials/ runs in a subprocess in FAST mode
(CPU, small particle counts / MCMC budgets) against the same vendored
datasets (tsdl.161, M1266, iclaims).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUTORIALS = os.path.join(REPO, "docs", "tutorials")

SCRIPTS = ["overview.py", "decomposition.py", "callbacks.py",
           "greedy_mcmc.py", "iclaims.py"]

OK_MARKERS = {
    "overview.py": "OVERVIEW TUTORIAL OK",
    "decomposition.py": "DECOMPOSITION TUTORIAL OK",
    "callbacks.py": "CALLBACKS TUTORIAL OK",
    "greedy_mcmc.py": "GREEDY/MCMC TUTORIAL OK",
    "iclaims.py": "ICLAIMS TUTORIAL OK",
}


@pytest.mark.slow  # e2e fits: ~6 min of the suite across the 5 scripts
@pytest.mark.parametrize("script", SCRIPTS)
def test_tutorial(script):
    env = dict(os.environ)
    env["AUTOGP_TUTORIAL_FAST"] = "1"
    env.pop("AUTOGP_TEST_TPU", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(TUTORIALS, script)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (
        f"{script} failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}")
    assert OK_MARKERS[script] in proc.stdout
