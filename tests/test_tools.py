"""Smoke tests for every CPU-runnable `tools/` entry point (VERDICT r4 #4).

Round 4 shipped `tools/ad_reference_ab.py` with a crash on its primary path
that no test caught because no test invoked it. These tests invoke each
tool's main() at tiny settings (1-2 epochs / a handful of trees) so a crash
anywhere on the primary path fails CI at commit time. Quality/parity are
asserted elsewhere (tests/test_real_data_parity.py band test, BASELINE.md
recorded runs) — here the contract is only "the tool runs end to end".

Reference-guarded: ad_reference_ab needs torch + /root/reference, like the
reference leg of real_data_parity.
"""

import json
import os

import pytest

from tools.real_data_parity import reference_available


def test_ad_quality_smoke(capsys):
    from tools.ad_quality import main

    main(["-seeds", "137", "-models", "IRGAN_Point", "-epochs", "1",
          "-burn_in", "0"])
    out = capsys.readouterr().out
    assert "IRGAN_Point" in out and "->" in out


def test_div_quality_smoke(capsys):
    from tools.div_quality import main

    main(["-seeds", "137", "-epochs", "1"])
    out = capsys.readouterr().out
    assert "DALETOR" in out and "DivProbRanker" in out


def test_tree_quality_smoke(capsys):
    from tools.tree_quality import main

    main(["-seeds", "137", "-epochs", "1", "-trees", "3"])
    out = capsys.readouterr().out
    assert "TPUGBDT" in out


@pytest.mark.skipif(not reference_available(),
                    reason="torch or /root/reference unavailable")
def test_ad_reference_ab_smoke(tmp_path, capsys):
    """The exact path that crashed in round 4 (reference players scored
    before reset_generator_discriminator)."""
    from tools.ad_reference_ab import main

    report = main(["-seeds", "137", "-models", "IRGAN_Pair", "-epochs", "1",
                   "-out", str(tmp_path / "ab.json")])
    key = "IRGAN_Pair@137"
    assert key in report
    for side in ("ours", "reference"):
        curve = report[key][side]
        assert 0 in curve and 1 in curve
        assert 0.0 <= curve[0]["G"] <= 1.0
    assert os.path.exists(tmp_path / "ab.json")
    json.loads((tmp_path / "ab.json").read_text())


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(),
                    reason="torch or /root/reference unavailable")
def test_parity_band_multiseed():
    """Guarded slow test (VERDICT r4 #5): the multi-seed band assertion the
    harness exists for. 30-epoch LambdaRank pointsf across 2 seeds; main()
    raises SystemExit(1) on a FAIL verdict — the assertion IS the exit code.
    Matches the recorded BASELINE.md protocol (3 seeds there; 2 here for CI
    wall-clock)."""
    from tools.real_data_parity import main

    report = main(["-model", "LambdaRank", "-sf", "pointsf", "-epochs", "30",
                   "-seeds", "137,7", "-dir_output", "/tmp/parity_ci"])
    assert report["parity_pass"] is True
