"""Docs-site build smoke (VERDICT r2 next #9): the generated API
reference must build and cover the full module surface, including the
numerical-deviations page (docs/api.md)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_site_builds():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_docs.py")],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]

    site = os.path.join(REPO, "docs", "site")
    index = open(os.path.join(site, "index.html")).read()
    for mod in ("autogp_tpu_api", "autogp_tpu_kernels",
                "autogp_tpu_inference_smc", "autogp_tpu_ops_cov_pallas",
                "autogp_tpu_parallel_mesh"):
        assert f'{mod}.html' in index
        assert os.path.exists(os.path.join(site, f"{mod}.html"))

    api_page = open(os.path.join(site, "autogp_tpu_api.html")).read()
    for name in ("fit_smc", "predict_mvn_sum", "GPModel", "to_dict"):
        assert name in api_page
    # The numerical-deviations section ships with the site.
    deviations = open(os.path.join(site, "api.html")).read()
    assert "eviation" in deviations
