"""Smoke tests for every CPU-runnable `tools/` entry point (VERDICT r4 #4).

Round 4 shipped `tools/ad_reference_ab.py` with a crash on its primary path
that no test caught because no test invoked it. These tests invoke each
tool at tiny settings (1-2 epochs / a handful of trees) so a crash anywhere
on the primary path fails CI at commit time. Quality/parity are asserted
elsewhere (the band test below, BASELINE.md recorded runs) — the smoke
contract is only "the tool runs end to end".

Each tool runs in a SUBPROCESS (the real CLI): the reference-A/B tools load
torch + the reference + jax simultaneously, and keeping that in-process
inflated the long suite's memory to where XLA-CPU could segfault in later
tests. Children exit and give the memory back.
"""

import json
import os
import subprocess
import sys

import pytest

from tools.real_data_parity import reference_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(module, *args, timeout=900):
    """Run `python -m tools.<module>` on CPU jax, axon registration bypassed
    (PALLAS_AXON_POOL_IPS gates the sitecustomize — CLAUDE.md)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", f"tools.{module}", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return proc.stdout


def test_ad_quality_smoke():
    out = run_tool("ad_quality", "-seeds", "137", "-models", "IRGAN_Point",
                   "-epochs", "1", "-burn_in", "0")
    assert "IRGAN_Point" in out and "->" in out


def test_div_quality_smoke():
    out = run_tool("div_quality", "-seeds", "137", "-epochs", "1")
    assert "DALETOR" in out and "DivProbRanker" in out


def test_tree_quality_smoke():
    out = run_tool("tree_quality", "-seeds", "137", "-epochs", "1",
                   "-trees", "3")
    assert "TPUGBDT" in out


@pytest.mark.skipif(not reference_available(),
                    reason="torch or /root/reference unavailable")
def test_ad_reference_ab_smoke(tmp_path):
    """The exact path that crashed in round 4 (reference players scored
    before reset_generator_discriminator)."""
    out_json = tmp_path / "ab.json"
    out = run_tool("ad_reference_ab", "-seeds", "137", "-models",
                   "IRGAN_Pair", "-epochs", "1", "-out", str(out_json))
    report = json.loads(out_json.read_text())
    key = "IRGAN_Pair@137"
    assert key in report
    for side in ("ours", "reference"):
        curve = report[key][side]
        assert "0" in curve and "1" in curve
        assert 0.0 <= curve["0"]["G"] <= 1.0


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(),
                    reason="torch or /root/reference unavailable")
def test_parity_band_multiseed(tmp_path):
    """Guarded slow test (VERDICT r4 #5): the multi-seed band assertion the
    harness exists for. 30-epoch LambdaRank pointsf across 2 seeds; the
    harness exits NONZERO on a FAIL verdict — the exit code is the
    assertion. Matches the recorded BASELINE.md protocol (3+ seeds there;
    2 here for CI wall-clock)."""
    out_json = tmp_path / "band.json"
    run_tool("real_data_parity", "-model", "LambdaRank", "-sf", "pointsf",
             "-epochs", "30", "-seeds", "137,7",
             "-dir_output", str(tmp_path), "-out", str(out_json),
             timeout=2400)
    report = json.loads(out_json.read_text())
    assert report["parity_pass"] is True
