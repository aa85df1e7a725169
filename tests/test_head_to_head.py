"""In-suite head-to-head: the reference's own ``train()`` vs ours (slow).

A shortened version of ``scripts/head_to_head.py`` (which produces the
committed 400-iter artifact in ``results/HEAD_TO_HEAD.json``): 120 iters on
the shared synthetic scene, gates on trajectory agreement and on the
cross-renders of the same weights through both pipelines.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


def test_head_to_head_short(tmp_path):
    out = tmp_path / "report.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "head_to_head.py"),
         "--iters", "120", "--workdir", str(tmp_path / "wd"),
         "--out", str(out), "--cpu", "--psnr_tol", "2.5",
         "--xrender_db", "30"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    rep = json.load(open(out))
    assert rep["gates"]["all"]
    # the cross-renders certify bit-level pipeline parity, far beyond the
    # 30 dB gate (observed 115-145 dB)
    assert rep["cross_render"]["ours_weights_theirs_vs_ours_render_psnr"] > 30
    assert rep["cross_render"]["theirs_weights_ours_vs_theirs_render_psnr"] > 30
